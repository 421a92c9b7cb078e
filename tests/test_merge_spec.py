"""Declarative MERGE spec (round-3 verdict #4): kernel vs a row-by-row dict
oracle, distributed path equivalence, and the SpecTable lake e2e (reference
merge shapes: bronze/cdc_ingestion.py:169-224, gold/cdf_processor.py:206-328)."""

import numpy as np
import pandas as pd
import pytest

from maritime_activity_reports_cdc_ray.stages.merge_spec import (MergeBranch,
                                                         MergeSpec,
                                                         SpecTable,
                                                         apply_merge_spec,
                                                         merge_into)


# --------------------------------------------------------------------- oracle
def _env(keys, trow, srow):
    ns = {}
    if trow is not None:
        for c, v in trow.items():
            ns[f"t_{c}"] = v
    if srow is not None:
        for c, v in srow.items():
            ns[f"s_{c}"] = v
    for k in keys:
        ns[k] = (trow or srow)[k]
    return ns


def oracle_merge(target_rows, source_rows, spec):
    """Row-by-row Python replay of SQL/Delta MERGE semantics — the executable
    specification the vectorized kernel must match."""
    keys = list(spec.keys)
    tmap = {tuple(r[k] for k in keys): dict(r) for r in target_rows}
    smap = {}
    for r in source_rows:
        key = tuple(r[k] for k in keys)
        assert key not in smap, "oracle: duplicate source key"
        smap[key] = dict(r)

    def assigns_of(br, trow, srow, tcols):
        if br.set is not None:
            return br.set
        return {c: f"s_{c}" for c in tcols
                if c not in keys and srow is not None and c in srow}

    out = []
    tcols = list(target_rows[0].keys()) if target_rows else keys
    for key, trow in tmap.items():
        srow = smap.get(key)
        branches = spec.when_matched if srow is not None \
            else spec.when_not_matched_by_source
        ns = _env(keys, trow, srow)
        fate = "keep"
        for br in branches:
            if br.condition is None or bool(eval(br.condition, {}, ns)):
                if br.action == "delete":
                    fate = "drop"
                elif br.action == "update":
                    new = dict(trow)
                    for c, expr in assigns_of(br, trow, srow, tcols).items():
                        new[c] = eval(expr, {}, ns)
                    trow = new
                break
        if fate == "keep":
            out.append(trow)
    for key, srow in smap.items():
        if key in tmap:
            continue
        ns = _env(keys, None, srow)
        for br in spec.when_not_matched:
            if br.condition is None or bool(eval(br.condition, {}, ns)):
                if br.action == "insert":
                    new = {c: None for c in tcols}
                    for k in keys:
                        new[k] = srow[k]
                    for c, expr in assigns_of(br, None, srow, tcols).items():
                        new[c] = eval(expr, {}, ns)
                    out.append(new)
                break
    return sorted(out, key=lambda r: tuple(r[k] for k in keys))


SPEC = MergeSpec(
    keys=["k"],
    when_matched=[
        MergeBranch("update", condition="s_has_open == 1",
                    set={"bal": "t_bal + s_total", "status": "'OPEN'",
                         "n": "s_cnt"}),
        MergeBranch("delete", condition="t_bal + s_total < -500"),
        MergeBranch("update", set={"bal": "t_bal + s_total",
                                   "status": "'SETTLED'", "n": "s_cnt"}),
    ],
    when_not_matched=[
        MergeBranch("insert", condition="s_cnt >= 2",
                    set={"bal": "s_total", "status": "'NEW'", "n": "s_cnt"})],
    when_not_matched_by_source=[
        MergeBranch("delete", condition="t_bal < 0"),
        MergeBranch("update", condition="t_bal == 0",
                    set={"status": "'DORMANT'"})],
)


def _rand_frames(seed, nt=120, ns_=90):
    rng = np.random.default_rng(seed)
    pool = max(300, 2 * max(nt, ns_))
    tkeys = rng.choice(pool, size=nt, replace=False)
    skeys = rng.choice(pool, size=ns_, replace=False)
    tgt = pd.DataFrame({
        "k": np.sort(tkeys).astype("int64"),
        "bal": rng.integers(-1000, 1000, nt).astype("int64"),
        "status": np.array(["NONE"] * nt, dtype=object),
        "n": np.zeros(nt, dtype="int64")})
    # a sprinkle of exact zeros so the == 0 branch fires
    tgt.loc[tgt.index[:5], "bal"] = 0
    src = pd.DataFrame({
        "k": np.sort(skeys).astype("int64"),
        "total": rng.integers(-800, 800, ns_).astype("int64"),
        "has_open": rng.integers(0, 2, ns_).astype("int64"),
        "cnt": rng.integers(1, 5, ns_).astype("int64")})
    return tgt, src


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_kernel_matches_dict_oracle(seed):
    tgt, src = _rand_frames(seed)
    got, stats = apply_merge_spec(tgt, src, SPEC)
    exp = oracle_merge(tgt.to_dict("records"), src.to_dict("records"), SPEC)
    assert got.to_dict("records") == exp
    assert stats["matched_updated"] + stats["matched_deleted"] \
        + stats["matched_noop"] <= len(src)


def test_branch_order_first_match_wins():
    tgt = pd.DataFrame({"k": [1], "v": [10]})
    src = pd.DataFrame({"k": [1], "x": [5]})
    spec = MergeSpec(
        keys=["k"],
        when_matched=[MergeBranch("update", condition="s_x > 0",
                                  set={"v": "100"}),
                      MergeBranch("update", set={"v": "200"})])
    out, _ = apply_merge_spec(tgt, src, spec)
    assert out.v.tolist() == [100]  # first true branch, not the catch-all


def test_unmatched_rows_pass_through_or_ignore():
    tgt = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    src = pd.DataFrame({"k": [2, 3], "x": [0, 0]})
    # no branch accepts anything: matched rows no-op, source-only ignored,
    # target-only kept (classic MERGE with all-false conditions)
    spec = MergeSpec(keys=["k"],
                     when_matched=[MergeBranch("update", condition="s_x > 99",
                                               set={"v": "0"})])
    out, stats = apply_merge_spec(tgt, src, spec)
    assert out.to_dict("records") == [{"k": 1, "v": 1}, {"k": 2, "v": 2}]
    assert stats["inserted"] == 0 and stats["source_ignored"] == 1


def test_set_none_means_all_source_columns():
    tgt = pd.DataFrame({"k": [1, 2], "a": [10, 20], "b": ["x", "y"]})
    src = pd.DataFrame({"k": [2, 3], "a": [99, 77], "b": ["z", "w"]})
    spec = MergeSpec(keys=["k"],
                     when_matched=[MergeBranch("update")],
                     when_not_matched=[MergeBranch("insert")])
    out, _ = apply_merge_spec(tgt, src, spec)
    assert out.to_dict("records") == [
        {"k": 1, "a": 10, "b": "x"}, {"k": 2, "a": 99, "b": "z"},
        {"k": 3, "a": 77, "b": "w"}]


def test_nmbs_update_requires_explicit_set():
    """WHEN NOT MATCHED BY SOURCE ... UPDATE with set=None is refused: there
    is no source row to default assignments from — the implicit {c: s_c}
    would null every non-key column (review regression)."""
    tgt = pd.DataFrame({"k": [1, 2], "v": [1, 2]})
    src = pd.DataFrame({"k": [2], "v": [9]})
    spec = MergeSpec(keys=["k"],
                     when_not_matched_by_source=[MergeBranch("update")])
    with pytest.raises(ValueError, match="explicit `set`"):
        apply_merge_spec(tgt, src, spec)
    # an explicit SET works and touches only unmatched-target rows
    spec2 = MergeSpec(keys=["k"], when_not_matched_by_source=[
        MergeBranch("update", set={"v": "-1"})])
    out, stats = apply_merge_spec(tgt, src, spec2)
    assert out.to_dict("records") == [{"k": 1, "v": -1}, {"k": 2, "v": 2}]
    assert stats["target_updated"] == 1


def test_bool_column_nulls_survive_insert():
    """A bool target column left unset by an insert branch must come out
    NULL, not silently True (astype(bool) maps NaN -> True — review
    regression)."""
    tgt = pd.DataFrame({"k": [1], "flag": [True], "v": [1]})
    src = pd.DataFrame({"k": [2], "v": [9]})
    spec = MergeSpec(keys=["k"],
                     when_not_matched=[MergeBranch("insert", set={"v": "s_v"})])
    out, _ = apply_merge_spec(tgt, src, spec)
    ins = out[out["k"] == 2]
    assert pd.isna(ins["flag"]).all()
    kept = out[out["k"] == 1]
    assert bool(kept["flag"].iloc[0]) is True


def test_duplicate_source_keys_refused():
    tgt = pd.DataFrame({"k": [1], "v": [1]})
    src = pd.DataFrame({"k": [1, 1], "v": [2, 3]})
    with pytest.raises(ValueError, match="duplicate match keys"):
        apply_merge_spec(tgt, src, MergeSpec(
            keys=["k"], when_matched=[MergeBranch("update")]))


def test_merge_into_distributed_equals_kernel(ray_session):
    import ray.data as rd

    tgt, src = _rand_frames(99, nt=400, ns_=250)
    exp, _ = apply_merge_spec(tgt, src, SPEC)
    got = (merge_into(rd.from_pandas(tgt).repartition(7),
                      rd.from_pandas(src).repartition(5), SPEC,
                      num_partitions=6)
           .to_pandas().sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[exp.columns].astype(exp.dtypes.to_dict()),
                                  exp)


def test_spec_table_lake_e2e(ray_session, tmp_path):
    """The lake face: epoch 1 insert-only seed, epoch 2 custom branches incl.
    a when_not_matched_by_source delete (forces the every-pid visit), epoch
    replay no-ops, state matches the dict oracle throughout."""
    import pyarrow as pa
    import ray.data as rd

    schema = pa.schema([("k", pa.int64()), ("bal", pa.int64()),
                        ("status", pa.string()), ("n", pa.int64())])
    st = SpecTable.create(str(tmp_path / "spec"), ["k"], schema,
                          num_partitions=4)
    tgt, src = _rand_frames(5)
    seed_spec = MergeSpec(
        keys=["k"], when_not_matched=[MergeBranch("insert")])
    r1 = st.merge_epoch(rd.from_pandas(tgt), seed_spec, epoch=1)
    assert r1["inserted"] == len(tgt)
    state1 = st.read().to_pandas().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        state1, tgt.sort_values("k").reset_index(drop=True))

    r2 = st.merge_epoch(rd.from_pandas(src), SPEC, epoch=2)
    assert not r2["skipped"] and r2["target_deleted"] > 0
    exp = oracle_merge(tgt.to_dict("records"), src.to_dict("records"), SPEC)
    state2 = st.read().to_pandas().sort_values("k").reset_index(drop=True)
    assert state2.to_dict("records") == exp

    # exactly-once: replaying a committed epoch is a no-op
    r2b = st.merge_epoch(rd.from_pandas(src), SPEC, epoch=2)
    assert r2b["skipped"]
    state2b = st.read().to_pandas().sort_values("k").reset_index(drop=True)
    assert state2b.to_dict("records") == exp

    # a fresh handle resumes from the manifest
    st2 = SpecTable(str(tmp_path / "spec"))
    assert st2.read().count() == len(exp)
