"""Registry invariants: the driver contract's query ordering is
load-bearing (the driver verifies the FIRST 50 registered queries),
so guard it against silent drift."""

import __spark_entry__ as entry
from deepicedrain_spark import suite


def test_priority_names_all_registered():
    # a typo'd PRIORITY entry silently drops from the ordering
    missing = [n for n in suite.PRIORITY if n not in suite.REGISTRY]
    assert not missing, f"PRIORITY entries not registered: {missing}"


def test_priority_has_no_duplicates():
    assert len(suite.PRIORITY) == len(set(suite.PRIORITY))


def test_every_query_has_an_oracle():
    q = entry.queries()
    o = entry.oracle_sql()
    assert set(q) == set(o), set(q) ^ set(o)


def test_driver_window_covers_every_family():
    """Round-5 policy: the driver checks the FIRST 50 registered
    queries, and cumulative driver-green coverage is what counts — so
    every SURVEY §2 family sentinel must be EITHER inside the current
    window OR already driver-green in a recorded CORRECTNESS round
    (family representatives rotate out after earning their row; see
    suite.PRIORITY's round-5 comment)."""
    import glob
    import json
    import os

    window = set(list(entry.queries())[:50])
    green = set()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for f in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        d = json.load(open(f))
        green |= {k for k, v in d.items() if v.get("hash_match") or v.get("rows_match")}
    sentinels = [
        "dhdt_per_point_regression",  # flagship A2
        "zarr_roundtrip",  # S4
        "geojson_roundtrip",  # S6/S7
        "raster_cube",  # S5
        "tsv_roundtrip",  # S8/S9
        "point_in_polygon_gridded",  # J1 scale path
        "crossover_track_intersections",  # J3
        "asof_last_purchase",  # as-of join
        "surface_tension_spline",  # A11
        "dbscan_distributed_summary",  # M1 scale path
        "lake_finder_pipeline",  # M2/M3
        "lake_catalog_dissolve",  # J6 (round 5)
        "minhash_near_dup",  # LLM dedup
        "ngram_jaccard_pairs",
        "cosine_topk_lsh",  # ANN
        "near_dup_components",
        "multimodal_real_decode",
        "dataset_split",
        "hdf5_roundtrip",  # S3 live scan + distributed sink (round 5)
        "netcdf_roundtrip",  # S5 bytes sink (round 3)
        "lake_finder_reference_params",  # M1 at reference eps/min_samples
        "streaming_session_counts",  # §2.11
        "streaming_asof_join",
    ]
    uncovered = [s for s in sentinels if s not in window and s not in green]
    assert not uncovered, f"neither in window nor driver-green: {uncovered}"


def test_registration_is_stable_and_complete():
    q = entry.queries()
    assert len(q) >= 114
    # ordering function is deterministic
    assert list(q) == list(entry.queries())


def test_synth_once_replaces_directory_target(tmp_path):
    """A token bump on a DIRECTORY fixture (e.g. a Zarr store) must not
    hit ENOTEMPTY from os.replace (ADVICE r9)."""
    import os

    from deepicedrain_spark.suite_custom import synth_once

    path = str(tmp_path / "store")

    def make_v1(p):
        os.makedirs(p)
        open(os.path.join(p, "old"), "w").write("1")

    def make_v2(p):
        os.makedirs(p)
        open(os.path.join(p, "new"), "w").write("2")

    assert synth_once(path, make_v1, token="v1") == path
    assert os.path.exists(os.path.join(path, "old"))
    synth_once(path, make_v2, token="v2")
    assert os.path.exists(os.path.join(path, "new"))
    assert not os.path.exists(os.path.join(path, "old"))
