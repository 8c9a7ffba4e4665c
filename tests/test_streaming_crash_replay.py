"""Mid-batch crash + replay correctness.

The exactly-once contract ("killed at ANY point, resume produces the
identical final table") is only honest if a crash BETWEEN state-table
commits of one micro-batch replays correctly: the batch's snapshot reads
(pre-upsert records, pre-delta block sizes, pre-delta incident edges,
pre-recompute component membership) must not observe the partially
committed post-state, or replay derives empty/doubled deltas and the state
diverges forever after. The fix is version-pinned reads
(``read_for(..., before_batch=batch_id)``) backed by stamp-preserving
compaction — these tests kill the kernel at every inter-commit boundary and
assert the resumed run converges to the uninterrupted result.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapping_analysis_spark.streaming.job import IncrementalClusteringJob

N_ROWS = 900


def _assign_set(df):
    return {(r["conv_id"], r["cluster_id"]) for r in df.collect()}


def _hashable(v):
    return tuple(_hashable(x) for x in v) if isinstance(v, list) else v


def _state_fingerprint(job):
    """Full logical state of every table (order-free)."""
    out = {}
    for st in job._tables:
        name = st.root.rsplit("/", 1)[-1]
        df = st.read()
        out[name] = (
            frozenset(tuple(_hashable(v) for v in r) for r in df.collect())
            if df is not None
            else frozenset()
        )
    return out


def _batches(transcripts, n=3):
    """Deterministic n-way split; turns of one conversation span batches."""
    df = transcripts.limit(N_ROWS).withColumn(
        "_s", F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n))
    )
    return [
        df.filter(F.col("_s") == i).drop("_s").localCheckpoint(eager=True)
        for i in range(n)
    ]


class _Boom(RuntimeError):
    pass


def _boom(*a, **kw):
    raise _Boom()


@pytest.fixture(scope="module")
def reference_run(spark, transcripts_smoke, tmp_path_factory):
    """Uninterrupted 3-batch run — the convergence target for every crash
    point."""
    ref = IncrementalClusteringJob(
        spark, str(tmp_path_factory.mktemp("ref_state"))
    )
    for i, b in enumerate(_batches(transcripts_smoke)):
        ref.process_batch(b, i)
    return _assign_set(ref.result()), _state_fingerprint(ref)


# every state table committed strictly after `records` in the per-batch
# commit order — a crash before each one leaves a distinct partial prefix
CRASH_POINTS = [
    "blocks", "bands", "block_sizes", "edges", "node_comp", "comp_members",
    "assignments",
]


@pytest.mark.parametrize("crash_at", CRASH_POINTS)
def test_mid_batch_crash_replay_converges(
    spark, transcripts_smoke, tmp_path, reference_run, crash_at
):
    """Kill batch 1 just before the ``crash_at`` table commits (everything
    ordered earlier IS committed), replay it, run batch 2 — final state of
    every table must equal the uninterrupted run's."""
    want_assign, want_state = reference_run
    batches = _batches(transcripts_smoke)

    job = IncrementalClusteringJob(spark, str(tmp_path / "crash"))
    job.process_batch(batches[0], 0)
    victim = getattr(job, crash_at)
    orig = victim.apply_delta
    victim.apply_delta = _boom
    with pytest.raises(_Boom):
        job.process_batch(batches[1], 1)
    victim.apply_delta = orig
    # the victim table must NOT be committed, records (upstream) must be
    assert not victim.committed(1)
    assert job.records.committed(1)
    job.process_batch(batches[1], 1)  # replay
    job.process_batch(batches[2], 2)

    assert _assign_set(job.result()) == want_assign
    got_state = _state_fingerprint(job)
    for name in want_state:
        assert got_state[name] == want_state[name], f"state diverged: {name}"


def test_mid_batch_crash_replay_with_compaction(spark, transcripts_smoke, tmp_path):
    """Crash mid-batch right after the records table COMPACTED (base
    rewrite): the pinned pre-batch reads must survive the rewrite — this is
    what stamp-preserving compaction guarantees."""
    batches = _batches(transcripts_smoke, 4)

    def mk(tag):
        j = IncrementalClusteringJob(spark, str(tmp_path / tag))
        for st in j._tables:
            st.compact_every = 2
        return j

    ref = mk("ref")
    for i, b in enumerate(batches):
        ref.process_batch(b, i)
    want = _assign_set(ref.result())
    want_state = _state_fingerprint(ref)

    job = mk("crash")
    for i in (0, 1):
        job.process_batch(batches[i], i)
    orig = job.blocks.apply_delta
    job.blocks.apply_delta = _boom
    with pytest.raises(_Boom):
        job.process_batch(batches[2], 2)
    job.blocks.apply_delta = orig
    assert job.records.committed(2) and not job.blocks.committed(2)
    job.process_batch(batches[2], 2)
    job.process_batch(batches[3], 3)

    assert _assign_set(job.result()) == want
    got_state = _state_fingerprint(job)
    for name in want_state:
        assert got_state[name] == want_state[name], f"state diverged: {name}"
