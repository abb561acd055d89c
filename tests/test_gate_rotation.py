"""The driver's correctness gate takes the FIRST ~50 names of the
registry order.  Rounds 5 and 7 both shipped a stale hand-rotated head
that would have re-checked already-green queries; the registry now
derives the order from the CORRECTNESS_r*.json files on disk
(least-recently-checked first), so the window self-rotates.  These tests
pin that property against the actual files in the repo root.
"""

from __future__ import annotations

import glob
import json
import os

from hadoop_coded_wordcount_spark.registry import (
    ORACLES,
    QUERIES,
    _RECHECK_FIRST,
    _gate_checked_rounds,
)

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _externally_checked() -> set:
    names: set = set()
    for path in glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")):
        with open(path) as f:
            names.update(json.load(f).keys())
    return names


def test_window_head_fills_with_never_checked_first():
    """Never-checked names must fill the window head before any checked
    name appears (ADVICE r8: a blanket 'no checked names in the first 50'
    would start failing — on a correctly working rotation — once fewer
    than 50 never-checked queries remain)."""
    checked = _externally_checked()
    head = [n for n in list(QUERIES)[:50] if n not in _RECHECK_FIRST]
    first_checked = next(
        (i for i, n in enumerate(head) if n in checked), len(head)
    )
    stale = [n for n in head[first_checked:] if n not in checked]
    assert not stale, (
        "never-checked queries sorted after checked ones in the gate "
        "window: %s" % stale
    )


def test_rechecks_lead_the_window():
    head = list(QUERIES)[: len(_RECHECK_FIRST)]
    assert head == [n for n in _RECHECK_FIRST if n in QUERIES]


def test_gate_checked_rounds_reads_driver_files():
    rounds = _gate_checked_rounds()
    checked = _externally_checked()
    assert set(rounds) == checked
    # every name the driver ever checked must still exist in the registry
    missing = checked - set(QUERIES)
    assert not missing, missing


def test_never_checked_names_all_precede_checked_names():
    """Ordering invariant: every never-checked query sorts before every
    externally-checked one (modulo the deliberate recheck head), so the
    backlog drains at the maximum 50/round rate."""
    checked = _externally_checked()
    order = [n for n in QUERIES if n not in _RECHECK_FIRST]
    seen_checked = False
    for n in order:
        if n in checked:
            seen_checked = True
        else:
            assert not seen_checked, (
                "never-checked %r sorted after a checked query" % n
            )


def test_oracle_dict_order_mirrors_queries():
    qnames = [n for n in QUERIES if n in ORACLES]
    assert qnames == list(ORACLES)
