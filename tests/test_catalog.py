"""Named-source catalog shim (SURVEY S11) — parameterized path
templates, driver dispatch, YAML loading, temp-view registration
(reference: intake catalog at atlas_catalog.yaml, consumed via
deepicedrain/__init__.py:31-37)."""

import numpy as np
import pytest

from deepicedrain_spark.catalog import Catalog

SF = "/root/testdata/sf0.001"


def _cat() -> Catalog:
    return Catalog.from_dict(
        {
            "sources": {
                "events": {
                    "driver": "parquet",
                    "description": "event stream table",
                    "parameters": {"sf_dir": {"default": SF}},
                    "args": {"urlpath": "{sf_dir}/events.parquet"},
                },
                "named_table": {
                    "driver": "parquet",
                    "parameters": {
                        "sf_dir": {"default": SF},
                        "table": {"default": None},  # required
                    },
                    "args": {"urlpath": "{sf_dir}/{table}.parquet"},
                },
            }
        }
    )


def test_catalog_default_and_override(spark):
    cat = _cat()
    n_default = cat.read(spark, "events").count()
    assert n_default == 1000
    n_big = cat.read(spark, "events", sf_dir="/root/testdata/sf0.01").count()
    assert n_big == 10000
    # attribute-style access, like intake's catalog.icesat2dhdt(...)
    assert cat.events(spark).count() == 1000


def test_catalog_required_param_and_errors(spark):
    cat = _cat()
    assert cat.read(spark, "named_table", table="region").count() > 0
    with pytest.raises(KeyError, match="missing parameters"):
        cat.read(spark, "named_table")
    with pytest.raises(KeyError, match="unknown parameters"):
        cat.read(spark, "events", nope=1)
    with pytest.raises(KeyError, match="no source named"):
        cat.read(spark, "ghost")


def test_catalog_from_yaml_and_hdf5_driver(spark, tmp_path):
    from deepicedrain_spark.sources.hdf5lite import write_hdf5

    h5 = str(tmp_path / "granule.h5")
    write_hdf5(
        h5,
        {"gt1l/land_ice_segments": {"h_li": np.arange(50, dtype="f4")}},
        chunk_rows=16,
        gzip=2,
    )
    ypath = str(tmp_path / "cat.yaml")
    with open(ypath, "w") as fh:
        fh.write(
            f"""
sources:
  granule:
    driver: hdf5
    description: ATL06-style per-beam granule
    parameters:
      beam:
        default: gt1l
    args:
      urlpath: "{h5}"
      group: "{{beam}}/land_ice_segments"
      datasets: ["h_li"]
      chunk_rows: 16
"""
        )
    cat = Catalog.from_yaml(ypath)
    df = cat.read(spark, "granule")
    assert df.count() == 50
    assert df.schema["h_li"].dataType.simpleString() == "float"


def test_catalog_register_views(spark):
    cat = _cat()
    done = cat.register_views(spark, table="nation")
    assert set(done) == {"events", "named_table"}
    assert spark.sql("SELECT count(*) AS n FROM events").collect()[0]["n"] == 1000
    assert spark.sql("SELECT count(*) FROM named_table").collect()[0][0] > 0


def test_catalog_misconfig_raises_not_skips(spark, tmp_path):
    """Review finding r4: only missing PARAMETER VALUES may skip a
    source during register_views; a bad template field or missing args
    key must raise at the config, not vanish into 'table not found'."""
    import pytest

    from deepicedrain_spark.catalog import Catalog

    cat = Catalog.from_dict(
        {
            "sources": {
                "bad_template": {
                    "driver": "parquet",
                    "args": {"urlpath": "/data/{undeclared}/x.parquet"},
                },
            }
        }
    )
    with pytest.raises(ValueError, match="undeclared"):
        cat.register_views(spark)


def test_catalog_brace_escapes_consistent():
    """{{...}} unescapes to {...} whether or not a field appears."""
    from deepicedrain_spark.catalog import SourceSpec

    spec = SourceSpec(
        name="s",
        driver="parquet",
        args={"a": "/d/{{lit}}/x", "b": "/d/{{lit}}/{p}/x"},
        parameters={"p": {"default": "v"}},
    )
    got = spec.resolve_args()
    assert got["a"] == "/d/{lit}/x"
    assert got["b"] == "/d/{lit}/v/x"
