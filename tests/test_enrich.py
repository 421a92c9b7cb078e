"""M8/M9 enrichment: declarative CASE ladders (vectorized np.select) and the
code-domain dim enrichment (ext/lang → file_kind/ecosystem)."""

import numpy as np
import pandas as pd

from maritime_activity_reports_cdc_ray.stages.enrich import (
    CaseLadder,
    Rule,
    code_enrichment,
    extract_ext,
    make_enricher,
)


def test_case_ladder_priority_and_ops():
    lad = CaseLadder("tier", [
        Rule("v", "ge", 100, "high"),
        Rule("v", "between", (50, 100), "mid"),
        Rule("k", "in", ("a", "b"), "special"),   # lower priority than bands
        Rule("k", "prefix", "x", "xish"),
    ], "low")
    df = pd.DataFrame({"v": [150, 60, 10, 10, 10],
                       "k": ["a", "a", "a", "xy", "q"]})
    assert lad.apply(df).tolist() == ["high", "mid", "special", "xish", "low"]


def test_case_ladder_empty_and_enricher():
    lad = CaseLadder("t", [Rule("v", "eq", 1, "one")], "other")
    fn = make_enricher([lad])
    out = fn(pd.DataFrame({"v": [1, 2]}))
    assert out["t"].tolist() == ["one", "other"]
    empty = fn(pd.DataFrame({"v": pd.Series(dtype="int64")}))
    assert len(empty) == 0 and "t" in empty.columns


def test_extract_ext():
    s = pd.Series(["a/b/c.py", "README", "x.tar.gz", "noext.", "d.YAML"])
    assert extract_ext(s).tolist() == ["py", "", "gz", "", "yaml"]


def test_code_enrichment():
    df = pd.DataFrame({
        "path": ["src/m.py", "doc/readme.md", "conf/app.yaml", "LICENSE", "w.bin"],
        "lang": ["py", "md", "yml", "txt", "bin"],
    })
    out = code_enrichment(df)
    assert out.file_kind.tolist() == ["source", "docs", "config", "docs", "other"]
    # extensionless path falls back to lang ('txt' → docs); ecosystem from ext
    assert out.ecosystem.tolist() == ["python", "none", "none", "none", "none"]


def test_code_enrichment_in_pipeline(ray_session):
    import ray.data as rd

    df = pd.DataFrame({"path": [f"f{i}.py" if i % 2 else f"f{i}.md"
                                for i in range(100)],
                       "lang": ["py"] * 100})
    out = (rd.from_pandas(df).map_batches(code_enrichment, batch_format="pandas")
           .to_pandas())
    assert (out.file_kind == np.where(np.arange(100) % 2, "source", "docs")).all()


def test_metadata_scorer():
    from maritime_activity_reports_cdc_ray.stages.enrich import Rule
    from maritime_activity_reports_cdc_ray.stages.validate import MetadataScorer

    scorer = MetadataScorer([
        (Rule("name", "nonempty", None, None), 0.5),
        (Rule("size", "between", (5, 45), None), 0.25),
        (Rule("price", "ge", 10.0, None), 0.25),
    ])
    df = pd.DataFrame({
        "name": ["a", "", None, "d"],
        "size": [10, 10, 50, 4],
        "price": [20.0, 20.0, 20.0, 5.0],
    })
    out = scorer(df)
    assert out["metadata_quality_score"].tolist() == [1.0, 0.5, 0.25, 0.5]
    assert out["metadata_quality_category"].tolist() == [
        "EXCELLENT", "FAIR", "POOR", "FAIR"]
    # empty-frame passthrough keeps the columns
    e = scorer(df.iloc[0:0])
    assert len(e) == 0 and "metadata_quality_score" in e.columns


def test_nonempty_rule_op():
    from maritime_activity_reports_cdc_ray.stages.enrich import CaseLadder, Rule

    lad = CaseLadder("has_name", [Rule("name", "nonempty", None, True)], False)
    got = lad.apply(pd.DataFrame({"name": ["x", "", None]}))
    assert got.tolist() == [True, False, False]
