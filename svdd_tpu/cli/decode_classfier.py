"""Classifier-guidance decode CLI (reference decode_classfier.py —
filename typo preserved for script parity).

Adds --guidance_scale; writes log/{task}-{reward}-classfier.npz. The
reference needs cudnn disabled for the GRU backward (its diff sets
torch.backends.cudnn.enabled=False); the lax.scan GRU differentiates
natively.
"""

from __future__ import annotations

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
      algo='classifier',
      value_fn=vf.as_onehot_pair(),
      gen_batch_num=args.val_batch_num,
      batch_size=args.batch_size,
      sample_M=args.sample_M,
      guidance_scale=args.guidance_scale,
      seed=args.seed,
      skip_best_of_n=args.skip_best_of_n,
  )

  path = common.npz_path(args, '-classfier')
  result.save_npz(path)
  LOGGER.info('wrote %s', path)
  for name, row in quantile_report(
      {'decoding': result.reward_preds,
       'baseline': result.baseline_preds}).items():
    LOGGER.info('%s: %s', name, row)


def main() -> None:
  parser = common.make_parser('classifier-guidance decoding')
  parser.add_argument('--guidance_scale', type=float, default=1.0)
  run(parser.parse_args())


if __name__ == '__main__':
  main()
