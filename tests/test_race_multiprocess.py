"""Cross-PROCESS artifact-race lane (r13, r12 VERDICT item 5).

Every standing-store publish protocol carries in-process two-builder
tests, but threads in one SparkSession share the Python interpreter and
the JVM — a real deployment races separate driver PROCESSES on a shared
artifact root.  Each test here spawns two real interpreters (own
SparkSession each), barriers them so the builds genuinely overlap, and
asserts (a) both processes succeed, (b) both serve IDENTICAL content,
(c) the shared root holds exactly one committed artifact with zero
staging/debris leftovers.

Run with ``pytest -m race`` (~2 min: four JVM startups dominate); the
full gate includes it.  Not marked quick.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.race

REPO = Path(__file__).resolve().parents[1]
CHILD = str(REPO / "tests" / "race_child.py")


def _race(mode: str, shared_sf: str, tmp_path: Path) -> str:
    """Run two barriered child processes; return their (equal) RESULT
    lines' artifact dir.  Children get a PRIVATE TMPDIR so the shared
    artifact root is test-scoped and inspectable."""
    barrier = tmp_path / "barrier"
    barrier.mkdir()
    artdir = tmp_path / "artifacts"
    artdir.mkdir()
    env = dict(os.environ, TMPDIR=str(artdir))
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, mode, shared_sf, str(barrier), str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            env=env,
            cwd=str(REPO),
        )
        for i in (0, 1)
    ]
    results = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            p.kill()
            raise
        assert p.returncode == 0, (
            f"racer failed rc={p.returncode}\n--- stderr tail ---\n"
            + se.decode(errors="replace")[-3000:]
        )
        lines = [l for l in so.decode().splitlines() if l.startswith("RESULT")]
        assert lines, f"no RESULT line:\n{so.decode()[-2000:]}"
        results.append(lines[-1])
    assert results[0] == results[1], f"racers served different content: {results}"
    return str(artdir)


def _entries(artdir: str, prefix: str) -> list[str]:
    return sorted(d for d in os.listdir(artdir) if d.startswith(prefix))


def test_race_two_processes_ann_standing_index(tmp_path):
    """ensure_standing_index: staged-rename one-shot publish + debris
    recovery must hold across real processes."""
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copyfile(
        "/root/testdata/sf0.001/embeddings.parquet", str(sf / "embeddings.parquet")
    )
    artdir = _race("ann", str(sf), tmp_path)
    roots = _entries(artdir, "msgdp_ivfpq_")
    committed = [r for r in roots if ".stage." not in r and ".debris." not in r]
    leftovers = [r for r in roots if ".stage." in r or ".debris." in r]
    assert len(committed) == 1, roots
    assert leftovers == [], f"race left staging/debris: {leftovers}"
    root = os.path.join(artdir, committed[0])
    assert os.path.exists(f"{root}/models.json")
    assert os.path.exists(f"{root}/snapshot/_LATEST")


def test_race_two_processes_prefix_gram_index(tmp_path):
    """prefix_index_build under the generational protocol: exactly one
    committed generation wins; the loser's staging is gone."""
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copyfile(
        "/root/testdata/sf0.001/documents.parquet", str(sf / "documents.parquet")
    )
    artdir = _race("prefix", str(sf), tmp_path)
    roots = _entries(artdir, "msgdp_ppj_")
    assert len(roots) == 1, roots
    root = os.path.join(artdir, roots[0])
    inside = sorted(os.listdir(root))
    gens = [
        d
        for d in inside
        if d.startswith("gen-") and os.path.exists(f"{root}/{d}/_commit")
    ]
    stages = [d for d in inside if d.startswith("stage.")]
    assert len(gens) == 1, inside
    assert stages == [], f"race left staging dirs: {stages}"


def test_race_two_processes_lexicon(tmp_path):
    """ensure_standing_lexicon on the r13 generational layout: two
    processes racing append(bid=0) + compact must converge on ONE
    committed generation serving identical postings/meta, with no
    staging leftovers (the deterministic bid makes the double append a
    replay no-op; the lease serializes the compacts; the second
    compactor's fold detection no-ops on the already-folded batch set)."""
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copyfile(
        "/root/testdata/sf0.001/documents.parquet", str(sf / "documents.parquet")
    )
    artdir = _race("lex", str(sf), tmp_path)
    roots = _entries(artdir, "msgdp_lex_")
    assert len(roots) == 1, roots
    root = os.path.join(artdir, roots[0])
    inside = sorted(os.listdir(root))
    gens = [
        d
        for d in inside
        if d.startswith("gen-") and os.path.exists(f"{root}/{d}/_commit")
    ]
    stages = [d for d in inside if d.startswith("stage.")]
    # racers may commit one generation (second compact no-ops on the
    # folded set) or two (both raced past the no-op check before the
    # lease serialized them — the LOSER built from the same single
    # batch, so both generations are content-identical); either way no
    # staging debris and at most 2 generations survive the GC
    assert 1 <= len(gens) <= 2, inside
    assert stages == [], f"race left staging dirs: {stages}"
    bids = sorted(os.listdir(f"{root}/batches/tf"))
    assert bids == ["batch_id=0"], f"replayed append double-published: {bids}"


def test_race_two_processes_result_cache(tmp_path):
    """cache.serve_cached: both processes must serve the identical
    artifact, with exactly one data dir and no staging copies."""
    sf = tmp_path / "sf"
    sf.mkdir()
    shutil.copyfile(
        "/root/testdata/sf0.001/orders.parquet", str(sf / "orders.parquet")
    )
    artdir = _race("cache", str(sf), tmp_path)
    roots = _entries(artdir, "msgdp_rc_")
    assert len(roots) == 1, roots
    root = os.path.join(artdir, roots[0])
    inside = sorted(os.listdir(root))
    assert "_rc_ready" in inside and "data" in inside, inside
    staging = [d for d in inside if d.startswith("data.")]
    assert staging == [], f"race left staging copies: {staging}"
