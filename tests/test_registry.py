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
    """One representative of each SURVEY §2 family / LLM capability /
    streaming extension must sit inside the driver's 50-query window."""
    window = list(entry.queries())[:50]
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
        "minhash_near_dup",  # LLM dedup
        "ngram_jaccard_pairs",
        "cosine_topk_lsh",  # ANN
        "near_dup_components",
        # multimodal: the REAL-codec decode replaced the byte-math fake
        # as the window representative in round 3
        "multimodal_real_decode",
        "dataset_split",
        "hdf5_roundtrip",  # S3 live scan (round 3)
        "netcdf_roundtrip",  # S5 bytes sink (round 3)
        "lake_finder_reference_params",  # M1 at reference eps/min_samples
        "streaming_session_counts",  # §2.11
        "streaming_asof_join",
    ]
    missing = [s for s in sentinels if s not in window]
    assert not missing, f"fell out of the driver window: {missing}"


def test_registration_is_stable_and_complete():
    q = entry.queries()
    assert len(q) >= 114
    # ordering function is deterministic
    assert list(q) == list(entry.queries())
