"""Unit tests for tools/step_cost.py::collective_payloads.

The parser reads optimized HLO text and sums collective payload bytes.
Two failure modes it must resist (both bit us or were flagged by review):
  * XLA's all-reduce combiner emits VARIADIC tuple ops whose printed shape
    contains `/*index=N*/` comments — stopping at the first '=' undercounts.
  * TPU-compiled HLO appends brace-delimited layout annotations that contain
    parens (`{1,0:T(8,128)}`), which would terminate a naive `\\([^)]*\\)`
    tuple match early and silently drop the rest of the payload
    (ADVICE r4 finding).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools"))

from step_cost import collective_payloads  # noqa: E402


def test_simple_allreduce():
    hlo = "%ar = f32[128,256] all-reduce(%x), replica_groups={}\n"
    out = collective_payloads(hlo)
    assert out["all-reduce"] == (1, 128 * 256 * 4)


def test_variadic_tuple_with_index_comments():
    hlo = ("%arc = (f32[64]{0} /*index=0*/, bf16[32,32]{1,0} /*index=1*/) "
           "all-reduce-start(%a, %b), replica_groups={{0,1}}\n")
    out = collective_payloads(hlo)
    assert out["all-reduce"] == (1, 64 * 4 + 32 * 32 * 2)


def test_tpu_layout_annotations_do_not_truncate_tuple():
    # parens INSIDE the layout braces of the first tuple element must not
    # stop the match before the second element
    hlo = ("%arc = (f32[8,128]{1,0:T(8,128)} /*index=0*/, "
           "f32[256]{0:T(256)} /*index=1*/) "
           "all-reduce(%a, %b), replica_groups={{0,1,2,3}}\n")
    out = collective_payloads(hlo)
    assert out["all-reduce"] == (1, 8 * 128 * 4 + 256 * 4)


def test_single_shape_with_tpu_layout():
    hlo = ("%ag = bf16[512,1024]{1,0:T(8,128)(2,1)} all-gather(%p), "
           "dimensions={0}\n")
    out = collective_payloads(hlo)
    assert out["all-gather"] == (1, 512 * 1024 * 2)


def test_mixed_ops_and_done_not_double_counted():
    hlo = ("%s = f32[16]{0} collective-permute-start(%x)\n"
           "%d = f32[16]{0} collective-permute-done(%s)\n"
           "%rs = f32[4,4] reduce-scatter(%y), dimensions={0}\n")
    out = collective_payloads(hlo)
    assert out["collective-permute"] == (1, 16 * 4)
    assert out["reduce-scatter"] == (1, 4 * 4 * 4)
