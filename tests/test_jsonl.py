"""JSONL source: schema contract, dead-letter split, round-trip."""

import json
import os

import pytest
from pyspark.sql import types as T

from reddit_etl_spark.sources.jsonl import read_jsonl, write_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


@pytest.fixture()
def landing(tmp_path):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello world", "source": "web"}),
        json.dumps({"doc_id": 2, "text": "second doc", "source": "web"}),
        '{"doc_id": 3, "text": "truncated',          # malformed
        "not json at all",                            # malformed
        json.dumps({"doc_id": 5, "source": "web"}),   # missing text
        json.dumps({"doc_id": 6, "text": None, "source": "api"}),  # null text
    ]
    p = tmp_path / "in.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_split_good_vs_dead(spark, landing):
    good, dead = read_jsonl(spark, landing, SCHEMA, required=["doc_id", "text"])
    assert [f.name for f in good.schema.fields] == ["doc_id", "text", "source"]
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    reasons = sorted((r.reason, r.raw_line) for r in dead.collect())
    assert [r[0] for r in reasons] == [
        "malformed", "malformed", "missing_required", "missing_required",
    ]
    # every dead row keeps the original bytes verbatim for replay
    assert any(r[1] == "not json at all" for r in reasons)
    replayed = [json.loads(r[1]) for r in reasons if r[0] == "missing_required"]
    assert {d["doc_id"] for d in replayed} == {5, 6}


def test_no_required_fields_admits_partial_rows(spark, landing):
    good, dead = read_jsonl(spark, landing, SCHEMA)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2, 5, 6]
    assert dead.count() == 2


def test_write_then_read_round_trip(spark, tmp_path, landing):
    good, _ = read_jsonl(spark, landing, SCHEMA, required=["doc_id", "text"])
    out = str(tmp_path / "out")
    write_jsonl(good, out, n_files=1)
    back, dead = read_jsonl(spark, out, SCHEMA, required=["doc_id", "text"])
    assert dead.count() == 0
    assert sorted((r.doc_id, r.text) for r in back.collect()) == [
        (1, "hello world"), (2, "second doc"),
    ]
    files = [f for f in os.listdir(out) if f.endswith(".json")]
    assert len(files) == 1


def test_parsing_stays_jvm_side(spark, landing):
    good, _ = read_jsonl(spark, landing, SCHEMA)
    plan = good._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
