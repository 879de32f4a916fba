#!/usr/bin/env python
"""Reference-compatible CLI shim: python scripts_cli/evaluate.py <config.yaml> ...
(mirrors the reference's scripts/evaluate.py entrypoint)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vings_mono_tpu.runners.evaluate import main

if __name__ == "__main__":
    main()
