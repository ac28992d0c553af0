"""Resume-from-manifest tests (north_rule: resumable mid-pipeline with
per-partition lineage + metrics)."""

import json
import os

from rdf_extraction_ray import synth
from rdf_extraction_ray.pipelines.manifest import (
    MANIFEST_NAME,
    read_output,
    run_sharded,
)

TKEY = ["subj", "pred", "obj", "obj_kind", "obj_lang", "obj_datatype"]


def _triple_set(out_dir):
    df = read_output(out_dir).to_pandas()
    return set(map(tuple, df[TKEY].fillna("").itertuples(index=False)))


class TestResume:
    def test_partial_run_then_resume_equals_clean_run(self, tmp_path):
        turns_dir = synth.write_turns(str(tmp_path / "turns"), 60, seed=9)

        # clean run
        clean_dir = str(tmp_path / "clean")
        run_sharded(turns_dir, clean_dir, n_shards=4)
        clean = _triple_set(clean_dir)

        # simulated failure: only shards 0-1 complete
        resumed_dir = str(tmp_path / "resumed")
        run_sharded(turns_dir, resumed_dir, n_shards=4, shards=[0, 1])
        done = {d for d in os.listdir(resumed_dir) if d.startswith("shard=")}
        assert done == {"shard=0", "shard=1"}

        # resume: finished shards are skipped, the rest run
        summary = run_sharded(turns_dir, resumed_dir, n_shards=4)
        assert summary[0]["skipped"] and summary[1]["skipped"]
        assert not summary[2]["skipped"] and not summary[3]["skipped"]
        assert _triple_set(resumed_dir) == clean

    def test_manifest_lineage_counters(self, tmp_path):
        turns_dir = synth.write_turns(str(tmp_path / "turns"), 40, seed=4)
        out = str(tmp_path / "out")
        summary = run_sharded(turns_dir, out, n_shards=2)
        for s, m in summary.items():
            with open(os.path.join(out, f"shard={s}", MANIFEST_NAME)) as f:
                on_disk = json.load(f)
            assert on_disk["triples_out"] > 0
            assert on_disk["facts_detected"] > 0
            assert on_disk["input_fingerprint"]
            hist = on_disk["link_status_histogram"]
            assert hist.get("person=linked", 0) > 0  # miss counters live here

    def test_changed_input_invalidates_manifest(self, tmp_path):
        turns_dir = synth.write_turns(str(tmp_path / "turns"), 20, seed=6)
        out = str(tmp_path / "out")
        run_sharded(turns_dir, out, n_shards=2)
        # regenerate with different content → fingerprint changes
        synth.write_turns(str(tmp_path / "turns"), 25, seed=6)
        summary = run_sharded(turns_dir, out, n_shards=2)
        assert all(not m["skipped"] for m in summary.values())

    def test_empty_shards_complete_and_resume(self, tmp_path):
        """A selection leaving most shards EMPTY must still complete
        every shard (hive-partitioned prepartition creates no dir for
        an empty shard) and resume as all-skipped."""
        import pyarrow.parquet as pq
        turns_dir = synth.write_turns(str(tmp_path / "turns"), 3, seed=2)
        # keep only one conversation → with 8 shards most are empty
        t = pq.read_table(os.path.join(turns_dir, "turns-0000.parquet"))
        keep = t.filter(
            __import__("pyarrow.compute", fromlist=["equal"]).equal(
                t.column("conv_id"), "conv0000000"))
        one = str(tmp_path / "one")
        os.makedirs(one)
        pq.write_table(keep, os.path.join(one, "turns.parquet"))
        out = str(tmp_path / "out")
        summary = run_sharded(one, out, n_shards=8)
        assert len(summary) == 8
        assert sum(m["triples_out"] for m in summary.values()) > 0
        assert sum(m["triples_out"] == 0 for m in summary.values()) >= 6
        summary2 = run_sharded(one, out, n_shards=8)
        assert all(m["skipped"] for m in summary2.values())


def test_cli_curate_end_to_end(tmp_path):
    """CLI curate: quality gate + exact dedup + sharded write."""
    import json as _json
    import os

    import pandas as pd

    from rdf_extraction_ray.__main__ import main
    long = ("a reasonably long sentence with plenty of words in it "
            "for the quality gate to accept without any complaint")
    df = pd.DataFrame({
        "doc_id": range(6),
        "text": [long, long, long + " tail", "short", long + " tail",
                 long + " other"],
    })
    inp = str(tmp_path / "docs.parquet")
    df.to_parquet(inp)
    out = str(tmp_path / "shards")
    import contextlib, io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["curate", "--input", inp, "--out", out,
                   "--shards", "2"])
    assert rc == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    # 6 in; "short" fails quality; dups of `long` and `long tail`
    # collapse to min id → survivors {0, 2, 5}
    assert stats["docs_in"] == 6 and stats["docs_out"] == 3
    got = pd.read_parquet(out)
    assert sorted(got["doc_id"]) == [0, 2, 5]
    assert {d for d in os.listdir(out) if d.startswith("shard=")}
