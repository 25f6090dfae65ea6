#!/usr/bin/env python3
"""Shim: the CLI lives in ffn_tpu.cli.compute_partitions (console script
`ffn_tpu_compute_partitions` when pip-installed)."""

from ffn_tpu.cli.compute_partitions import app

if __name__ == "__main__":
    app()
