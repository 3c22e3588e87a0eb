"""Package console entry (`lanczosnet-run`), same surface as run_exp.py.

The repo-root `run_exp.py` stays the reference-parity invocation
(`python run_exp.py -c …`); this module makes the identical flow
available once the package is installed.
"""

from __future__ import annotations

import sys
import traceback

import numpy as np

from lanczosnet_tpu.train.runner import build_runner
from lanczosnet_tpu.utils.config import load_config, parse_arguments
from lanczosnet_tpu.utils.logger import get_logger, setup_logging


def main(argv=None) -> int:
    args = parse_arguments(argv)
    config = load_config(args.config_file, is_test=args.test, comment=args.comment)
    setup_logging(f"{config.save_dir}/run.log", args.log_level)
    log = get_logger()
    np.random.seed(int(config.seed))
    log.info(
        "exp %s | run %s | config %s",
        config.exp_name, config.run_id, args.config_file,
    )
    try:
        runner = build_runner(config)
        result = runner.test() if args.test else runner.train()
        log.info("done: %s", result)
        return 0
    except Exception:
        log.error("run failed:\n%s", traceback.format_exc())
        return 1


if __name__ == "__main__":
    sys.exit(main())
