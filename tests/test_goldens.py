"""Byte-equality regression goldens for the structurally-validated emitters.

MSA output is proven byte-identical to the reference's published truth
files (test_truth_parity.py); no truth files exist for GAF / GFA W-lines /
GFA P-lines / DOT (reference: ``src/io/gaf.rs:152-304``,
``io/graph.rs:245-502``), so current outputs — validated structurally and
quirk-faithfully in round 1 — are pinned here as in-repo goldens.  Any
emitter change that shifts a byte fails these tests; intentional changes
must regenerate ``tests/goldens/`` and say why in the commit.
"""

import io
import contextlib
import os

import pytest

from poasta_tpu.cli.poasta import main as poasta_main
from poasta_tpu.cli.lasagna import main as lasagna_main

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _golden(name: str) -> str:
    with open(os.path.join(GOLDENS, name)) as fh:
        return fh.read()


def _run_stdout(main, argv):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(argv)
    assert rc in (0, None)
    return buf.getvalue()


@pytest.mark.parametrize(
    "corpus,fmt,golden",
    [
        ("small_test.fa", "gfa", "small_test.gfa"),
        ("small_test.fa", "gfav1", "small_test.gfav1"),
        ("small_test.fa", "dot", "small_test.dot"),
        ("test_from_abpoa.fa", "gfa", "test_from_abpoa.gfa"),
    ],
)
def test_poasta_emitter_goldens(reference_tests_dir, corpus, fmt, golden):
    out = _run_stdout(
        poasta_main,
        ["align", "-O", fmt, f"{reference_tests_dir}/{corpus}"],
    )
    assert out == _golden(golden)


def test_lasagna_gaf_golden(tmp_path, reference_tests_dir):
    out_path = tmp_path / "out.gaf"
    rc = lasagna_main(
        ["align", f"{reference_tests_dir}/test.gfa",
         f"{reference_tests_dir}/small_test.query.fa", "-o", str(out_path)]
    )
    assert rc in (0, None)
    assert out_path.read_text() == _golden("lasagna_small_query.gaf")
