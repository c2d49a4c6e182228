"""Named-source catalog shim (SURVEY S11).

The reference publishes its data surface as an intake YAML catalog of
named, PARAMETERIZED sources — ``deepicedrain/atlas_catalog.yaml:1-326``
defines e.g. ``icesat2dhdt`` with a ``placename`` parameter templated
into the path, consumed as ``catalog.icesat2dhdt(placename=...).
to_dask()`` (``deepicedrain/__init__.py:31-37``). This module is the
Spark-side equivalent: a YAML/dict catalog whose entries resolve
(name, params) → a DataFrame through the engine's own readers, and
which can register every resolvable source as a temp view so the SQL
surface sees the same names.

Remote HTTP sources (intake's ``simplecache::https://…``) stay out of
engine scope per SURVEY §2.1 S10 — the catalog resolves local paths;
an ingest job owns the download.

Drivers map to engine readers:
  parquet → spark.read.parquet        csv  → io.read_csv
  json    → spark.read.json           zarr → sources.zarr.read_zarr
  hdf5    → sources.hdf5.read_hdf5    geojson → sources.geojson
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


class MissingParameters(KeyError):
    """A source cannot resolve because required PARAMETERS lack values
    (the one condition register_views may legitimately skip on —
    misconfigured args/templates raise plain errors and surface)."""


@dataclass(frozen=True)
class SourceSpec:
    name: str
    driver: str
    args: dict
    parameters: dict = field(default_factory=dict)  # name -> {default: ...}
    description: str = ""

    def resolve_args(self, **params) -> dict:
        vals = {k: v.get("default") for k, v in self.parameters.items()}
        unknown = set(params) - set(self.parameters)
        if unknown:
            raise KeyError(f"catalog source {self.name!r}: unknown parameters {sorted(unknown)}")
        vals.update(params)
        missing = [k for k, v in vals.items() if v is None]
        if missing:
            raise MissingParameters(
                f"catalog source {self.name!r}: missing parameters {missing}"
            )

        def fmt(key, v):
            if isinstance(v, str):
                # ALWAYS format: {{...}} escapes unescape consistently
                # whether or not a field appears in the string, and an
                # undeclared template field is a loud config error
                try:
                    return v.format(**vals)
                except (KeyError, IndexError, ValueError) as e:
                    raise ValueError(
                        f"catalog source {self.name!r}: arg {key!r} template "
                        f"{v!r} failed to resolve ({e}); declare the field "
                        "under parameters or escape literal braces as "
                        "doubled braces"
                    ) from e
            return v

        return {k: fmt(k, v) for k, v in self.args.items()}


class Catalog:
    """Name → parameterized source registry. ``cat.events()`` or
    ``cat.read(spark, "events", placename=...)`` → DataFrame."""

    def __init__(self, sources: dict[str, SourceSpec]):
        self.sources = sources

    # -- constructors -------------------------------------------------
    @classmethod
    def from_dict(cls, d: dict) -> "Catalog":
        out = {}
        for name, spec in d.get("sources", {}).items():
            out[name] = SourceSpec(
                name=name,
                driver=spec["driver"],
                args=dict(spec.get("args", {})),
                parameters={k: dict(v) for k, v in spec.get("parameters", {}).items()},
                description=spec.get("description", ""),
            )
        return cls(out)

    @classmethod
    def from_yaml(cls, path: str) -> "Catalog":
        import yaml

        with open(path) as fh:
            return cls.from_dict(yaml.safe_load(fh))

    # -- resolution ----------------------------------------------------
    def read(self, spark: SparkSession, name: str, **params) -> DataFrame:
        if name not in self.sources:
            raise KeyError(f"catalog: no source named {name!r}")
        spec = self.sources[name]
        args = spec.resolve_args(**params)
        driver = spec.driver
        if driver == "parquet":
            df = spark.read.parquet(args["urlpath"])
            cols = args.get("columns")
            return df.select(*cols) if cols else df
        if driver == "csv":
            from deepicedrain_spark.io import read_csv

            return read_csv(
                spark,
                args["urlpath"],
                sep=args.get("sep", ","),
                null_value=args.get("null_value"),
                dtypes=args.get("dtypes"),
            )
        if driver == "json":
            return spark.read.json(args["urlpath"])
        if driver == "zarr":
            from deepicedrain_spark.sources.zarr import read_zarr

            return read_zarr(spark, args["urlpath"])
        if driver == "hdf5":
            from deepicedrain_spark.sources.hdf5 import read_hdf5

            return read_hdf5(
                spark,
                args["urlpath"],
                args["group"],
                args["datasets"],
                chunk_rows=args.get("chunk_rows"),
            )
        if driver == "geojson":
            from deepicedrain_spark.sources.geojson import read_geojson_polygons

            return read_geojson_polygons(spark, args["urlpath"])
        raise ValueError(f"catalog: unsupported driver {driver!r} for {name!r}")

    def __getattr__(self, name: str):
        if name.startswith("_") or name not in self.__dict__.get("sources", {}):
            raise AttributeError(name)

        def factory(spark: SparkSession, **params) -> DataFrame:
            return self.read(spark, name, **params)

        return factory

    def register_views(self, spark: SparkSession, **params) -> list[str]:
        """CREATE OR REPLACE TEMP VIEW for every source whose
        parameters resolve with the given values. ONLY sources whose
        required parameters lack values are skipped (returned list =
        registered); a genuinely misconfigured source (missing args
        keys, bad template fields) raises here, at the config, instead
        of surfacing later as 'table not found'."""
        done = []
        for name, spec in self.sources.items():
            try:
                self.read(spark, name, **{
                    k: v for k, v in params.items() if k in spec.parameters
                }).createOrReplaceTempView(name)
                done.append(name)
            except MissingParameters:
                continue
        return done
