#!/usr/bin/env python3
"""Shim: the CLI lives in ffn_tpu.cli.train (console script
`ffn_tpu_train` when pip-installed)."""

from ffn_tpu.cli.train import app

if __name__ == "__main__":
    app()
