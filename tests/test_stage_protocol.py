"""Stage protocol: pipelines as data, schema contracts, drop-in operators
(SURVEY.md §2.2 "user-extension surface")."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from joint_entity_and_relation_extraction_ray.pipelines.run import (
    CombinedStage,
    _FnStage,
    kg_stages,
    run_checkpointed,
)
from joint_entity_and_relation_extraction_ray.pipelines.stage import (
    run_pipeline,
)


def _src_stage(name="src", n=10):
    return _FnStage(
        name,
        [],
        lambda u: ray.data.from_arrow(
            pa.table({"x": pa.array(range(n), pa.int64())})
        ),
        output_schema=pa.schema([("x", pa.int64())]),
    )


def test_run_pipeline_basic(ray_session):
    doubled = _FnStage(
        "doubled",
        ["src"],
        lambda u: u["src"].map_batches(
            lambda t: pa.table({"x": pc.multiply(t["x"], 2)}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
    )
    out = run_pipeline([_src_stage(), doubled])
    assert sorted(out["doubled"].to_pandas()["x"]) == [i * 2 for i in range(10)]


def test_run_pipeline_rejects_unordered_deps(ray_session):
    dangling = _FnStage("b", ["a"], lambda u: u["a"])
    with pytest.raises(ValueError, match="topologically"):
        run_pipeline([dangling])


def test_output_schema_contract_enforced(ray_session):
    lying = _FnStage(
        "bad",
        [],
        lambda u: ray.data.from_arrow(pa.table({"y": ["oops"]})),
        output_schema=pa.schema([("x", pa.int64())]),
    )
    with pytest.raises(ValueError, match="missing declared column"):
        run_pipeline([lying])


def test_custom_scorer_injection(ray_session, sf0001_corpus, tmp_path):
    """Drop-in operator: replace the scorer stage with a subclass and run
    the FULL checkpointed pipeline — downstream stages consume the custom
    output untouched."""

    class CustomScorer(CombinedStage):
        def apply_shard(self, k, upstream, ctx):
            ds = super().apply_shard(k, upstream, ctx)

            def _rebrand(t: pa.Table) -> pa.Table:
                pred = pc.binary_join_element_wise(
                    pa.array(["custom"] * len(t), pa.string()),
                    pc.coalesce(t["pred"], ""),
                    "_",
                )
                pred = pc.if_else(pc.is_valid(t["pred"]), pred, t["pred"])
                return t.set_column(
                    t.schema.get_field_index("pred"), "pred", pred
                )

            return ds.map_batches(
                _rebrand, batch_format="pyarrow", zero_copy_batch=True
            )

    stages = kg_stages(
        str(sf0001_corpus / "transcripts"),
        str(sf0001_corpus / "aliases.parquet"),
        str(sf0001_corpus / "entities.parquet"),
    )
    default = stages[0]
    assert isinstance(default, CombinedStage)
    custom = CustomScorer(
        default.src_files,
        default.src_sigs,
        default.aliases,
        default.alias_sig,
        default.batch_size,
        default.concurrency,
    )
    m = run_checkpointed(
        str(sf0001_corpus / "transcripts"),
        str(sf0001_corpus / "aliases.parquet"),
        str(sf0001_corpus / "entities.parquet"),
        str(tmp_path / "out"),
        stages=[custom] + stages[1:],
    )
    assert m["stages"]["triples"] > 0
    triples = ray.data.read_parquet(str(tmp_path / "out" / "triples"))
    preds = set(triples.to_pandas()["pred"])
    assert preds and all(p.startswith("custom_") for p in preds)
    edges = ray.data.read_parquet(str(tmp_path / "out" / "edges"))
    assert all(
        p.startswith("custom_") for p in set(edges.to_pandas()["pred"])
    )


def test_cli_job_submit_entry(tmp_path):
    """The `ray job submit` surface (pipelines/run.py CLI): a fresh
    subprocess owns its own Ray session, runs the checkpointed job over
    the sf0.001 fixture corpus, and prints the manifest JSON."""
    import json
    import subprocess
    import sys

    import os

    fx = "/tmp/kgray_fixtures/sf0.001-seed42-v3"
    env = dict(os.environ, KGRAY_NUM_CPUS="8")  # bounded + contention-proof
    out = subprocess.run(
        [
            sys.executable,
            "-m",
            "joint_entity_and_relation_extraction_ray.pipelines.run",
            "--transcripts", f"{fx}/transcripts",
            "--aliases", f"{fx}/aliases.parquet",
            "--entities", f"{fx}/entities.parquet",
            "--out", str(tmp_path / "job_out"),
        ],
        capture_output=True,
        text=True,
        timeout=1200,
        cwd="/root/repo",
        env=env,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    manifest = json.loads(out.stdout.strip().splitlines()[-1])
    assert manifest["stages"], manifest
    assert all(v is None or v >= 0 for v in manifest["stages"].values())


def test_encoder_seam_swaps_without_pipeline_changes(ray_session):
    """VERDICT r2 #6: a second Encoder implementation goes through
    TripleScorer/extract_combined config only — no pipeline edits — and
    num_gpus plumbs into the stage's map_batches kwargs."""
    from joint_entity_and_relation_extraction_ray.pipelines.kg import (
        extract_combined,
        mentions_of,
        scorer_map_kwargs,
        to_table,
    )
    from joint_entity_and_relation_extraction_ray.stages.scorer import (
        AllCapsEncoder as _AllCapsEncoder,
    )

    aliases = pa.table(
        {
            "alias": pa.array(["acme corp"], pa.string()),
            "ent_type": pa.array(["Org"], pa.string()),
            "canonical_id": pa.array(["e1"], pa.string()),
        }
    )
    transcripts = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["c1", "c1"], pa.string()),
                "turn_idx": pa.array([0, 1], pa.int32()),
                "text": pa.array(
                    ["NASA launched from acme corp", "all lower here"],
                    pa.string(),
                ),
                "ts": pa.array([0, 1], pa.timestamp("us")),
            }
        )
    )

    # default encoder: gazetteer match finds "acme corp", not NASA
    default_out = to_table(
        mentions_of(extract_combined(transcripts, aliases, concurrency=1))
    )
    assert set(default_out["surface"].to_pylist()) == {"acme corp"}

    # swapped encoder: ALL-CAPS tagger finds NASA, not "acme corp"
    swapped_out = to_table(
        mentions_of(
            extract_combined(
                transcripts,
                aliases,
                concurrency=1,
                encoder_factory=_AllCapsEncoder,
            )
        )
    )
    assert set(swapped_out["surface"].to_pylist()) == {"NASA"}
    assert set(swapped_out["ent_type"].to_pylist()) == {"Misc"}

    # num_gpus plumbs through to the actor-pool stage kwargs
    kw = scorer_map_kwargs([], num_gpus=0.25, concurrency=2)
    assert kw["num_gpus"] == 0.25
    assert kw["concurrency"] == 2
    assert kw["fn_constructor_kwargs"]["encoder_factory"] is None
    kw2 = scorer_map_kwargs([], encoder_factory=_AllCapsEncoder)
    assert "num_gpus" not in kw2  # CPU default reserves no GPU
    assert kw2["fn_constructor_kwargs"]["encoder_factory"] is _AllCapsEncoder


def test_model_checkpoint_roundtrip(ray_session, tmp_path):
    """R12: save/load the scorer's model state as a digest-verified
    checkpoint directory; an actor pool constructed from the checkpoint
    scores identically to one built from the broadcast gazetteer; a
    tampered checkpoint refuses to load."""
    import json

    from joint_entity_and_relation_extraction_ray.pipelines.kg import (
        extract_combined,
        mentions_of,
        scorer_map_kwargs,
        to_table,
    )
    from joint_entity_and_relation_extraction_ray.stages.scorer import (
        TripleScorer,
        load_model_checkpoint,
        save_model_checkpoint,
    )

    gaz = [("acme corp", "Org"), ("jane doe", "Peop")]
    ck = tmp_path / "model_ck"
    digest = save_model_checkpoint(str(ck), gaz, max_unit_chars=4096)
    loaded = load_model_checkpoint(str(ck))
    assert loaded["gazetteer"] == gaz
    assert loaded["config"]["max_unit_chars"] == 4096
    assert len(digest) == 64

    # identical scoring through the actor pool, state loaded per actor
    transcripts = ray.data.from_arrow(
        pa.table(
            {
                "conv_id": pa.array(["c"], pa.string()),
                "turn_idx": pa.array([0], pa.int32()),
                "text": pa.array(
                    ["jane doe works for acme corp"], pa.string()
                ),
                "ts": pa.array([0], pa.timestamp("us")),
            }
        )
    )
    kw = scorer_map_kwargs([], concurrency=1)
    kw["fn_constructor_kwargs"] = {"checkpoint_path": str(ck)}
    from_ck = to_table(
        mentions_of(transcripts.map_batches(TripleScorer, **kw))
    )
    assert set(from_ck["surface"].to_pylist()) == {"jane doe", "acme corp"}
    # unit cap came from the checkpoint config
    assert TripleScorer(checkpoint_path=str(ck)).max_unit_chars == 4096

    # corruption: flip a byte in the gazetteer -> loud refusal
    g = ck / "gazetteer.parquet"
    raw = bytearray(g.read_bytes())
    raw[len(raw) // 2] ^= 0xFF
    g.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="digest mismatch"):
        load_model_checkpoint(str(ck))

    # version gate
    ck2 = tmp_path / "model_ck2"
    save_model_checkpoint(str(ck2), gaz)
    meta = json.loads((ck2 / "model.json").read_text())
    meta["format_version"] = 999
    (ck2 / "model.json").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="format"):
        load_model_checkpoint(str(ck2))
