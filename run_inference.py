#!/usr/bin/env python3
"""Shim: the CLI lives in ffn_tpu.cli.run_inference (console script
`ffn_tpu_run_inference` when pip-installed)."""

from ffn_tpu.cli.run_inference import app

if __name__ == "__main__":
    app()
