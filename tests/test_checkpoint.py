"""Checkpoint / lineage / resume semantics (SURVEY.md §4.4, §5.2.5)."""

import json

import pyarrow as pa
import ray.data

from joint_entity_and_relation_extraction_ray.sources.synth import ensure_corpus
from joint_entity_and_relation_extraction_ray.state.checkpoint import (
    Checkpointer,
    fingerprint,
)


def _src(n=100):
    return ray.data.from_arrow(
        pa.table({"x": pa.array(range(n), pa.int64())})
    )


def test_fingerprint_chains_params_and_deps():
    a = fingerprint("s", {"p": 1}, [])
    assert a != fingerprint("s", {"p": 2}, [])
    assert a != fingerprint("s2", {"p": 1}, [])
    assert fingerprint("s", {"p": 1}, ["x"]) != fingerprint("s", {"p": 1}, ["y"])


def test_skip_recompute_and_invalidation(tmp_path, ray_session):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return _src()

    ck = Checkpointer(tmp_path)
    ds1 = ck.run("stage_a", build, params={"v": 1})
    assert ds1.count() == 100 and calls["n"] == 1

    # second run, same params: reads parquet, no recompute
    ck2 = Checkpointer(tmp_path)
    ds2 = ck2.run("stage_a", build, params={"v": 1})
    assert ds2.count() == 100 and calls["n"] == 1

    # changed params invalidate
    ck3 = Checkpointer(tmp_path)
    ck3.run("stage_a", build, params={"v": 2})
    assert calls["n"] == 2


def test_downstream_invalidation_via_dep_chain(tmp_path, ray_session):
    calls = {"a": 0, "b": 0}

    def mk(name):
        def build():
            calls[name] += 1
            return _src(10)

        return build

    ck = Checkpointer(tmp_path)
    ck.run("a", mk("a"), params={"v": 1})
    ck.run("b", mk("b"), deps=["a"])
    assert calls == {"a": 1, "b": 1}

    # rerun unchanged: both skipped
    ck = Checkpointer(tmp_path)
    ck.run("a", mk("a"), params={"v": 1})
    ck.run("b", mk("b"), deps=["a"])
    assert calls == {"a": 1, "b": 1}

    # upstream param change transitively recomputes downstream
    ck = Checkpointer(tmp_path)
    ck.run("a", mk("a"), params={"v": 2})
    ck.run("b", mk("b"), deps=["a"])
    assert calls == {"a": 2, "b": 2}


def test_partitioned_write_and_manifest(tmp_path, ray_session):
    def build():
        return ray.data.from_arrow(
            pa.table(
                {
                    "x": pa.array(range(20), pa.int64()),
                    "part": pa.array([i % 4 for i in range(20)], pa.int32()),
                }
            )
        )

    ck = Checkpointer(tmp_path)
    ck.run("parted", build)
    m = json.loads((tmp_path / "parted.manifest.json").read_text())
    assert m["rows"] == 20
    # one directory per part bucket (resumable layout)
    parts = {p.name for p in (tmp_path / "parted").iterdir() if p.is_dir()}
    assert parts == {"part=0", "part=1", "part=2", "part=3"}
    # per-file rows recorded (per-partition lineage detail)
    assert sum(m["files"].values()) == 20
    assert (tmp_path / "metrics.jsonl").exists()


def test_checkpointed_pipeline_resume(tmp_path, ray_session):
    """Full pipeline twice over the same out_root: second run must reuse
    every checkpoint and produce identical edges."""
    from joint_entity_and_relation_extraction_ray.pipelines.run import (
        run_checkpointed,
    )

    corpus = ensure_corpus("sf0.001")
    kw = dict(
        transcripts_dir=str(corpus / "transcripts"),
        aliases_path=str(corpus / "aliases.parquet"),
        entities_path=str(corpus / "entities.parquet"),
        out_root=str(tmp_path / "out"),
    )
    m1 = run_checkpointed(**kw)
    edges1 = ray.data.read_parquet(str(tmp_path / "out" / "edges")).to_pandas()

    # delete one intermediate table file? no — resume contract: same inputs
    # -> all stages skipped (fingerprints equal), identical output
    m2 = run_checkpointed(**kw)
    assert m1["fingerprints"] == m2["fingerprints"]
    edges2 = ray.data.read_parquet(str(tmp_path / "out" / "edges")).to_pandas()
    key = ["subj_id", "pred", "obj_id"]
    assert (
        edges1.sort_values(key).reset_index(drop=True)[key + ["weight"]]
        .equals(edges2.sort_values(key).reset_index(drop=True)[key + ["weight"]])
    )

    # killing a stage (remove manifest) recomputes it and downstream reuse
    # still yields identical output
    (tmp_path / "out" / "canon.manifest.json").unlink()
    m3 = run_checkpointed(**kw)
    assert m3["fingerprints"] == m1["fingerprints"]
    edges3 = ray.data.read_parquet(str(tmp_path / "out" / "edges")).to_pandas()
    assert (
        edges1.sort_values(key).reset_index(drop=True)[key + ["weight"]]
        .equals(edges3.sort_values(key).reset_index(drop=True)[key + ["weight"]])
    )
