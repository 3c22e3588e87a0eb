#!/usr/bin/env python
"""CLI entry — parity with reference run_exp.py (SURVEY.md §3.1/§3.4).

Usage:
    python run_exp.py -c configs/qm8_lanczos_net.yaml        # train
    python run_exp.py -c configs/qm8_lanczos_net.yaml -t     # test

Delegates to the installable console entry (`lanczosnet_tpu.cli`).
"""

import sys

from lanczosnet_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
