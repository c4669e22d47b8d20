"""Generational publish protocol for STANDING STORES — the one commit
discipline every build-once/serve-forever artifact in this engine uses
(r13, r12 VERDICT item 3: "four protocols is three too many to audit
forever").

A standing store is a directory whose contents are rebuilt rarely
(compaction, retrain) but read constantly (serve paths), with grow-only
appends arriving between rebuilds.  The protocol gives every such store
the same four guarantees with the same on-disk vocabulary:

    root/
      gen-000042-<uid>/      one GENERATION = one immutable consistent view
        _commit              live iff this marker exists (single rename)
        <tables...>          store-specific payload, staged then renamed in
        _folded/<bid>        manifest: append batch ids compacted into this base
      _compacting.<uid>      compaction/retrain lease (fences in-flight appends)

1. **Atomic commit** — a generation becomes live via ONE marker rename;
   a crash anywhere before it leaves the previous generation fully
   live, and a reader can never observe tables from two different
   rebuilds (the torn-vocab / torn-models class of bug).
2. **Immutability** — committed generations are never modified; rebuilds
   write a brand-new one.  Readers that resolved a generation keep a
   consistent view for the lifetime of their plan.
3. **Replay idempotence** — the ``_folded`` manifest records which
   append batch ids a rebuild absorbed, so a streaming checkpoint
   replay of an already-folded batch is a no-op, not a double-append.
4. **Race fencing** — the TTL'd ``_compacting`` lease (heartbeat-renewed
   by live compactors, stale-ignored for crashed ones) serializes
   rebuilds and lets appenders re-check the live generation after
   publishing.

Consumers (each store keeps its own table layout; only the COMMIT
discipline is shared):

- the prefix-gram PPJoin index (``queries.dedup`` — the protocol's
  origin, r12),
- the BM25 lexicon (``queries.text`` — migrated r13 from its older
  meta.json-commit discipline),
- the standing IVF+PQ ANN index's REBALANCE path
  (``queries.similarity.ann_rebalance_if_skewed`` — r13: the lease
  fences retrains; the snapshot ``_LATEST`` pointer stays the read-side
  commit, with models/label_lists versioned per snapshot version so one
  pointer flip commits all three).

Stores that deliberately KEEP a simpler discipline (documented here so
the audit has one place to look):

- **Bloom / zonemap manifests** (``sinks``): they live INSIDE a
  committed snapshot version (built before the pointer commit) or
  refresh with their own lighter race-safe moves (r14: the zonemap
  refresh claim-swaps a staged COMPLETE manifest; the Bloom refresh
  writes unique ``words_delta_*`` dirs whose duplicates are probe-safe
  by construction — both raced two-process in the ``-m race`` lane); a
  stale manifest degrades to a louder full scan (``StaleManifestError``
  fallback), never a wrong answer — the full generation machinery would
  still add nothing but moving parts.
- **CM-sketch rollups** (``streaming.ann_stream.cm_rollup_stream``):
  per-batch idempotent overwrites of independent cell tables; merge
  happens at read time (union of sketches ≡ sketch of union), so there
  is no multi-table consistency to protect.
- **result cache** (``cache.serve_cached``): single-file staged-rename
  entries keyed by plan+snapshot fingerprint; an entry is either fully
  present or absent, and a miss just recomputes — per-entry atomicity
  is the whole requirement.

All FS access goes through the Hadoop FileSystem API handles the caller
provides (``sinks._fs_for``), so a root may be an object-store prefix —
with the documented caveat that ``rename``-as-commit needs a store with
atomic rename (HDFS/ABFS-hier/local); on S3-style stores the marker
create is still atomic but stage renames are copies.
"""

from __future__ import annotations

import re
import threading
import time
import uuid
from contextlib import contextmanager

GEN_RE = re.compile(r"^gen-(\d{6})-[0-9a-f]+$")
LEASE_TTL_S = 600.0


def marker_commit(fs, hpath, path: str) -> None:
    """Create a marker file via tmp-write + rename (atomic on every FS
    the repo targets; parents auto-created by Hadoop create())."""
    tmp = hpath(f"{path}.tmp.{uuid.uuid4().hex[:6]}")
    out = fs.create(tmp, True)
    out.write(bytearray(b"ready"))
    out.close()
    fs.rename(tmp, hpath(path))


def committed_gens(fs, hpath, root: str) -> list[str]:
    """Ascending names of committed generation dirs under ``root``."""
    if not fs.exists(hpath(root)):
        return []
    out = []
    for st in fs.listStatus(hpath(root)):
        nm = st.getPath().getName()
        if (
            st.isDirectory()
            and GEN_RE.match(nm)
            and fs.exists(hpath(f"{root}/{nm}/_commit"))
        ):
            out.append(nm)
    return sorted(out)


def current_gen(fs, hpath, root: str) -> str | None:
    """Path of the live (max committed) generation, or None pre-build."""
    gens = committed_gens(fs, hpath, root)
    return f"{root}/{gens[-1]}" if gens else None


def next_gen_name(fs, hpath, root: str) -> str:
    """Name for the generation AFTER the current live one (uid-suffixed
    so two racers can never collide on a directory name)."""
    gens = committed_gens(fs, hpath, root)
    seq = int(GEN_RE.match(gens[-1]).group(1)) + 1 if gens else 0
    return f"gen-{seq:06d}-{uuid.uuid4().hex[:8]}"


def gen_folded_bids(fs, hpath, gen: str) -> list[str]:
    """Batch ids recorded in a generation's ``_folded`` manifest."""
    man = hpath(f"{gen}/_folded")
    if not fs.exists(man):
        return []
    return sorted(st.getPath().getName() for st in fs.listStatus(man))


def live_leases(fs, hpath, root: str, ttl_s: float = LEASE_TTL_S) -> list[str]:
    """Compaction lease files younger than the TTL (stale ones — a
    crashed compactor — are ignored, so appends never wedge)."""
    if not fs.exists(hpath(root)):
        return []
    out = []
    for st in fs.listStatus(hpath(root)):
        nm = st.getPath().getName()
        if nm.startswith("_compacting.") and not st.isDirectory():
            if time.time() * 1000 - st.getModificationTime() < ttl_s * 1000:
                out.append(nm)
    return out


def wait_leases_clear(
    fs, hpath, root: str, timeout_s: float | None = None, ttl_s: float = LEASE_TTL_S
) -> None:
    """Block until no live compaction lease remains.  The default bound
    is the lease TTL plus slack: a legitimate long compact (the 100×
    fold runs minutes) must not make waiting appenders raise spuriously,
    and a crashed compactor's lease goes stale at the TTL anyway — so
    waiting longer than TTL+slack can never be necessary."""
    if timeout_s is None:
        timeout_s = ttl_s + 60.0
    t0 = time.time()
    while live_leases(fs, hpath, root, ttl_s=ttl_s):
        if time.time() - t0 > timeout_s:
            raise TimeoutError(f"compaction lease on {root} held > {timeout_s}s")
        time.sleep(0.2)


@contextmanager
def compaction_lease(fs, hpath, root: str, ttl_s: float = LEASE_TTL_S):
    """Acquire the store's compaction lease for the duration of a
    rebuild, heartbeat-renewed so a LIVE compactor can legitimately
    outlive the TTL (the 100× fold runs minutes) while a CRASHED one
    stops renewing and goes stale at the TTL — exactly the distinction
    that keeps waiting appenders from either wedging forever or being
    released mid-compact into the lost-batch window.

    Raises RuntimeError when another live lease exists (one rebuild at a
    time per store).  The lease file is deleted on exit — success or
    exception — and the heartbeat thread stops with it.

    Acquire is TWO-PHASE (r14, ADVICE: the probe-then-create of r13 was
    check-then-act — two processes could both pass the probe and both
    believe they held the lease, re-opening the append-vs-compact
    lost-batch window the lease exists to close).  Phase 1: the fast-path
    probe (unchanged).  Phase 2: create MY uid-named lease, then re-list;
    if ANY other live lease is visible, delete mine and raise.  Mutual
    exclusion holds without an atomic create-exclusive primitive (which
    Hadoop's local FS doesn't give): suppose A and B both proceed — A
    proceeding means B was invisible at A's re-list, so B's create
    finished after it, so B's re-list (which happens after B's create)
    runs after A's create and MUST see A's still-held lease, so B backs
    off.  The only cost is that near-simultaneous racers may BOTH yield
    — safe for every caller (compaction/rebalance callers already treat
    "in progress" as retry-next-round); a short jittered re-probe turns
    the both-yield case into one winner when the other racer is gone,
    while a REAL holder still raises immediately.  Requires only
    read-your-writes listing (local FS, HDFS, and current S3 all give
    it)."""
    import random

    lease = None
    for attempt in range(3):
        if live_leases(fs, hpath, root, ttl_s=ttl_s):
            raise RuntimeError(f"compact already in progress under {root}")
        cand = f"{root}/_compacting.{uuid.uuid4().hex[:8]}"
        marker_commit(fs, hpath, cand)
        mine = cand.rsplit("/", 1)[1]
        others = [nm for nm in live_leases(fs, hpath, root, ttl_s=ttl_s) if nm != mine]
        if not others:
            lease = cand
            break
        fs.delete(hpath(cand), False)
        if attempt == 2:
            raise RuntimeError(f"compact already in progress under {root}")
        # the conflicting racer may have yielded too — jittered re-probe;
        # if it actually held, the next probe raises above
        time.sleep(random.uniform(0.05, 0.2))
    stop_hb = threading.Event()

    def _heartbeat() -> None:
        while not stop_hb.wait(ttl_s / 4):
            try:
                now_ms = int(time.time() * 1000)
                fs.setTimes(hpath(lease), now_ms, now_ms)
            except Exception:  # noqa: BLE001 — lease deleted: exit quietly
                return

    hb = threading.Thread(target=_heartbeat, daemon=True)
    hb.start()
    try:
        yield lease
    finally:
        stop_hb.set()
        fs.delete(hpath(lease), False)


def commit_generation(fs, hpath, root: str, stage: str, gen_name: str) -> str:
    """Publish a fully-staged directory as a committed generation: one
    directory rename + one ``_commit`` marker.  Returns the generation
    path.  The caller owns losing gracefully: if the rename fails (a
    racer took the name — impossible with uid suffixes — or the FS
    denies it), the staging dir is deleted and the error propagates."""
    gen = f"{root}/{gen_name}"
    if not fs.rename(hpath(stage), hpath(gen)):
        fs.delete(hpath(stage), True)
        raise OSError(f"could not publish staged generation onto {gen}")
    marker_commit(fs, hpath, f"{gen}/_commit")
    return gen
