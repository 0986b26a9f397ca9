"""Unit tests for the HLO collective parser behind
scripts/comm_budget.py (the communication-budget audit)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                'scripts'))

from comm_budget import _shape_bytes, parse_collectives  # noqa: E402


def test_shape_bytes_simple_and_tuple():
  assert _shape_bytes('f32[8,64]{1,0}') == 8 * 64 * 4
  assert _shape_bytes('bf16[128]') == 128 * 2
  # tuple shapes (e.g. all-reduce of several operands) sum components
  assert _shape_bytes('(f32[4,4]{1,0}, bf16[8]{0})') == 64 + 16
  # scalars have an empty dims list
  assert _shape_bytes('pred[]') == 1


def test_parse_collectives_counts_and_bytes():
  hlo = """
  ENTRY main {
    %ar = f32[16,4]{1,0} all-reduce(%x), replica_groups={}, to_apply=%add
    %ag = bf16[32]{0} all-gather(%y), dimensions={0}
    %cp = f32[8]{0} collective-permute(%z), source_target_pairs={{0,1}}
    %ars = (f32[4]{0}, f32[4]{0}) all-reduce-start(%a, %b)
    %dot = f32[16,16]{1,0} dot(%p, %q)
  }
  """
  out = parse_collectives(hlo)
  assert out['all-reduce'] == [16 * 4 * 4, 2 * 4 * 4]  # incl. -start
  assert out['all-gather'] == [32 * 2]
  assert out['collective-permute'] == [8 * 4]
  assert 'all-to-all' not in out
  # non-collective ops (dot) never counted
  assert sum(len(v) for v in out.values()) == 4
