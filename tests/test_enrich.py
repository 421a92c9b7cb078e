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
