#!/usr/bin/env python
"""Repo-root shim so `python main.py --train/--test/...` works exactly
like the reference's entry point (reference main.py:324-367); the real
CLI lives in tpu_yolo/cli/main.py."""
from tpu_yolo.cli.main import main

if __name__ == "__main__":
    main()
