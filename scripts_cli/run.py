#!/usr/bin/env python
"""Reference-compatible CLI shim: python scripts_cli/run.py <config.yaml> ...
(mirrors the reference's scripts/run.py entrypoint)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vings_mono_tpu.runners.run import main

if __name__ == "__main__":
    main()
