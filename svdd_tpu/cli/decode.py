"""SVDD-MC decode CLI (reference decode.py).

Usage parity:
  python -m svdd_tpu.cli.decode --task rna --reward_name MRL --sample_M 10
Writes log/{task}-{reward}.npz with 'decoding'/'baseline' keys
(decode.py:117).
"""

from __future__ import annotations

import numpy as np

from svdd_tpu import utils
from svdd_tpu.cli import common
from svdd_tpu.decode import run_decode
from svdd_tpu.eval.metrics import quantile_report

LOGGER = utils.get_logger(__name__)


def run(args) -> None:
  cfg = common.task_config(args)
  diffusion = common.load_diffusion(args, cfg)
  reward_fn = common.load_reward_fn(args, cfg)
  vf = common.load_value_function(args, cfg)

  result = run_decode(
      diffusion, reward_fn,
      algo='svdd_mc',
      value_fn=vf.as_token_pair(),
      gen_batch_num=args.val_batch_num,
      batch_size=args.batch_size,
      sample_M=args.sample_M,
      seed=args.seed,
      skip_best_of_n=args.skip_best_of_n,
  )

  path = common.npz_path(args)
  result.save_npz(path)
  LOGGER.info('wrote %s', path)
  report = quantile_report({'decoding': result.reward_preds,
                            'baseline': result.baseline_preds,
                            'best_of_n': result.top_k})
  for name, row in report.items():
    LOGGER.info('%s: %s', name, row)


def main() -> None:
  parser = common.make_parser('SVDD-MC reward-guided decoding')
  run(parser.parse_args())


if __name__ == '__main__':
  main()
