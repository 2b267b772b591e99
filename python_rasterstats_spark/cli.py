"""Command-line driver — analog of the reference's click CLI
(cli.py:13-131: ``rio zonalstats`` / ``rio pointquery``) as a
``spark-submit``-able module.

Differences forced by the environment: rasters are either a corpus
directory (``--corpus DIR --dataset NAME``) or a ``.npy`` file with
``--affine "a b c d e f"`` — no GDAL paths. Features come from a GeoJSON
file/stdin exactly like the reference.

Examples
--------
    python -m python_rasterstats_spark.cli zonalstats features.geojson \
        --corpus data/zonal_fixtures --dataset slope --stats "count mean"
    echo '{"type":"Point","coordinates":[244700,1000500]}' | \
        python -m python_rasterstats_spark.cli pointquery - \
        --corpus data/zonal_fixtures --dataset slope
"""

from __future__ import annotations

import argparse
import json
import sys

RS = "\x1e"  # RFC 8142 record separator (reference cli.py:125-131)


def _read_features_arg(arg: str) -> str:
    if arg == "-":
        return sys.stdin.read()
    if arg.lower().endswith((".shp", ".gpkg")):
        return arg  # binary vector path: read_features dispatches to the
        # in-repo shapefile/geopackage readers (or fiona when installed)
    with open(arg) as f:
        return f.read()


def _resolve_raster(spark, args):
    import numpy as np

    from .api import TileRaster

    if args.corpus:
        from .sources.tables import load_corpus

        tiles, _, datasets = load_corpus(spark, args.corpus)
        if not args.dataset:
            raise SystemExit("--dataset is required with --corpus")
        return TileRaster(tiles, datasets, args.dataset), None
    if args.raster:
        if args.raster.lower().endswith((".tif", ".tiff")):
            # GeoTIFF: georeferencing + nodata come from the file itself
            # (tiffcodec / rasterio via api._resolve_raster); an explicit
            # --affine still passes through for files without geokeys
            aff = (
                tuple(float(v) for v in args.affine.split())
                if args.affine else None
            )
            return args.raster, aff
        if not args.affine:
            raise SystemExit("--affine 'a b c d e f' is required with --raster")
        arr = np.load(args.raster, allow_pickle=False)
        aff = tuple(float(v) for v in args.affine.split())
        return arr, aff
    raise SystemExit(
        "provide --corpus DIR --dataset NAME, or --raster FILE.npy|.tif"
    )


def _emit(features: list, args) -> None:
    if args.sequence:
        for feat in features:
            if args.rs:
                sys.stdout.write(RS)
            sys.stdout.write(json.dumps(feat) + "\n")
    else:
        out = {"type": "FeatureCollection", "features": features}
        sys.stdout.write(json.dumps(out, indent=args.indent or None) + "\n")


def _common(sub):
    sub.add_argument("features", help="GeoJSON file or '-' for stdin")
    sub.add_argument("--corpus", help="corpus directory (tiles/datasets parquet)")
    sub.add_argument("--dataset", help="dataset name within the corpus")
    sub.add_argument("--raster", help=".npy raster file")
    sub.add_argument("--affine", help="6 affine coefficients 'a b c d e f'")
    sub.add_argument("--nodata", type=float, default=None)
    sub.add_argument("--band", type=int, default=1)
    sub.add_argument("--sequence", action="store_true",
                     help="write RFC 7464-style GeoJSON sequence")
    sub.add_argument("--rs", action="store_true",
                     help="use RS (0x1E) as text separator (implies --sequence)")
    sub.add_argument("--indent", type=int, default=None)
    sub.add_argument("--cpus", type=int, default=None)


def main(argv=None):
    p = argparse.ArgumentParser(prog="python_rasterstats_spark")
    subs = p.add_subparsers(dest="cmd", required=True)

    zs = subs.add_parser("zonalstats", help="zonal statistics (reference cli.py:13-85)")
    _common(zs)
    zs.add_argument("--stats", default=None,
                    help="space-delimited stats, or 'all'")
    zs.add_argument("--all-touched", action="store_true")
    zs.add_argument("--categorical", action="store_true")
    zs.add_argument("--prefix", default="_")
    zs.add_argument("--info", action="store_true",
                    help="print dataset info and exit")

    pq = subs.add_parser("pointquery", help="point query (reference cli.py:88-131)")
    _common(pq)
    pq.add_argument("--interpolate", default="bilinear",
                    choices=["bilinear", "nearest"])
    pq.add_argument("--property-name", default="value")

    args = p.parse_args(argv)
    if args.rs:
        args.sequence = True

    from .session import get_spark

    spark = get_spark(
        master=f"local[{args.cpus}]" if args.cpus else None, app="prs-cli"
    )
    spark.sparkContext.setLogLevel("ERROR")

    raster, aff = _resolve_raster(spark, args)

    if args.cmd == "zonalstats" and args.info:
        from .operators.zonal import collect_dataset_meta

        meta = collect_dataset_meta(raster.datasets)
        print(json.dumps(meta.get(args.dataset), default=str, indent=2))
        return 0

    text = _read_features_arg(args.features)

    if args.cmd == "zonalstats":
        stats = args.stats
        if stats and "all" in stats.lower().split():
            stats = "ALL"  # reference cli.py:60-63
        from .api import gen_zonal_stats

        feats = list(
            gen_zonal_stats(
                text, raster, affine=aff, nodata=args.nodata, band=args.band,
                stats=stats, all_touched=args.all_touched,
                categorical=args.categorical, prefix=args.prefix,
                geojson_out=True, spark=spark,
            )
        )
        _emit(feats, args)
    else:
        from .api import gen_point_query

        feats = list(
            gen_point_query(
                text, raster, affine=aff, nodata=args.nodata, band=args.band,
                interpolate=args.interpolate, property_name=args.property_name,
                geojson_out=True, spark=spark,
            )
        )
        _emit(feats, args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
