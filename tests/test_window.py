"""Global window-function stage: row_number / NTILE semantics."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from biosample_enricher_ray.stages.window import global_row_numbers, ntile_of


def test_ntile_matches_sql_bucket_rule():
    # total=10, n=3 -> bucket sizes 4,3,3 (first total%n buckets get ceil)
    rn = np.arange(1, 11)
    tiles = ntile_of(rn, 10, 3)
    assert list(tiles) == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]
    # total < n_tiles: each row its own bucket
    assert list(ntile_of(np.arange(1, 4), 3, 10)) == [1, 2, 3]
    # even split
    assert list(ntile_of(np.arange(1, 9), 8, 4)) == [1, 1, 2, 2, 3, 3, 4, 4]


def test_global_row_numbers_sorted_and_dense():
    rng = np.random.default_rng(7)
    n = 5000
    df = pd.DataFrame({"k": rng.integers(0, 1000, n), "id": np.arange(n)})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(13)
    out = global_row_numbers(ds, ["k", "id"], n_tiles=7).to_pandas()
    assert len(out) == n
    out = out.sort_values("row_number").reset_index(drop=True)
    # dense 1..n
    assert out["row_number"].tolist() == list(range(1, n + 1))
    # row_number order == (k, id) lexicographic order
    expected = df.sort_values(["k", "id"]).reset_index(drop=True)
    assert out["id"].tolist() == expected["id"].tolist()
    # tile column matches the pure function of row_number
    assert (out["tile"].to_numpy()
            == ntile_of(out["row_number"].to_numpy(), n, 7)).all()


def test_global_row_numbers_descending():
    df = pd.DataFrame({"k": [3, 1, 2], "id": [0, 1, 2]})
    ds = ray.data.from_arrow(pa.Table.from_pandas(df))
    out = global_row_numbers(ds, ["k", "id"], descending=[True, False])
    got = out.to_pandas().sort_values("row_number")
    assert got["k"].tolist() == [3, 2, 1]
