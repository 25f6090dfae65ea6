#!/usr/bin/env python3
"""Shim: the CLI lives in ffn_tpu.cli.build_coordinates (console script
`ffn_tpu_build_coordinates` when pip-installed)."""

from ffn_tpu.cli.build_coordinates import app

if __name__ == "__main__":
    app()
