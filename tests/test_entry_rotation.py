"""Automatic driver-coverage rotation: queries() must order entries by
least-recently-green driver round (never-covered first) so the driver's
50-row CORRECTNESS cap covers every entry within two rounds by
construction (VERDICT r4 "Next round" #1)."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "spark_entry_under_test", "/root/repo/__spark_entry__.py"
)
entrymod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_spec and entrymod)


def test_rotation_orders_by_last_green_round():
    q = entrymod.queries()
    impls = entrymod._query_impls()
    assert set(q) == set(impls)          # a reordering, never a filter
    last = entrymod._last_covered_rounds()
    ranks = [last.get(k, -1) for k in q]
    assert ranks == sorted(ranks)        # least-recently-covered first

    # with >50 entries, everything outside the driver's 50-row cap must
    # have a GREENER (more recent) rank than everything inside it
    if len(q) > 50:
        keys = list(q)
        assert max(last.get(k, -1) for k in keys[:50]) <= min(
            last.get(k, -1) for k in keys[50:]
        )


def test_last_covered_rounds_reads_green_only(tmp_path, monkeypatch):
    # synthetic history: k1 green in r1 and r2, k2 red in r2, k3 absent
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "k1": {"rows_match": True, "schema_match": True,
               "hash_match": True, "err": None},
        "k2": {"rows_match": True, "schema_match": True,
               "hash_match": True, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "k1": {"rows_match": True, "schema_match": True,
               "hash_match": True, "err": None},
        "k2": {"rows_match": False, "schema_match": True,
               "hash_match": False, "err": None},
        "k4": {"rows_match": True, "schema_match": True, "err": None},
    }))
    real_dirname = os.path.dirname

    def fake_dirname(p):
        return str(tmp_path) if p.endswith("__spark_entry__.py") \
            else real_dirname(p)

    monkeypatch.setattr(entrymod.os.path, "dirname", fake_dirname)
    last = entrymod._last_covered_rounds()
    assert last["k1"] == 2
    assert last["k2"] == 1     # red r2 row does not advance coverage
    assert "k3" not in last
    assert last["k4"] == 2     # rows-only check (no hash field) counts
