"""Raster handle — parity surface for the reference's ``Raster`` class
(io.py:234-370): ``index(x, y)`` and windowed ``read(bounds=|window=)``
with boundless padding and nodata handling, backed by either an in-memory
ndarray or a tile corpus (tiles/datasets DataFrames).

The corpus-backed read gathers only the tiles overlapping the requested
window (tile-key pruned filter — no full scan), so interactive window
reads stay cheap even against a planetary table.
"""

from __future__ import annotations

import math
import warnings

import numpy as np

from .. import codecs as C
from .. import kernel as K


class NodataWarning(UserWarning):
    pass


class Raster:
    """2D raster access with reference read semantics.

    >>> with Raster(arr, affine=aff, nodata=-9999.0) as r:
    ...     sub = r.read(bounds=(w, s, e, n))
    >>> r = Raster.from_corpus(tiles_df, datasets_df, "slope")
    """

    def __init__(self, raster, affine=None, nodata=None, band=1):
        self.array = None
        self._corpus = None
        if isinstance(raster, np.ndarray):
            if affine is None:
                raise ValueError("Specify affine transform for numpy arrays")
            arr = raster
            if arr.ndim == 3:
                arr = arr[band - 1]
            self.array = arr
            self.affine = tuple(float(v) for v in tuple(affine)[:6])
            self.shape = arr.shape
            self.nodata = None if nodata is None else float(nodata)
        else:
            raise ValueError(
                "Raster accepts a numpy array (+affine); for corpus tables "
                "use Raster.from_corpus(tiles, datasets, dataset)"
            )

    @classmethod
    def from_corpus(cls, tiles, datasets, dataset: str, nodata=None):
        from ..operators.zonal import collect_dataset_meta

        meta = collect_dataset_meta(datasets)
        if dataset not in meta:
            raise ValueError(f"dataset {dataset!r} not in datasets table")
        m = meta[dataset]
        self = object.__new__(cls)
        self.array = None
        self._corpus = (tiles, dataset, m)
        self.affine = m["affine"]
        self.shape = (m["height"], m["width"])
        self.nodata = float(nodata) if nodata is not None else m["nodata"]
        return self

    def index(self, x, y):
        """(x, y) in CRS → (row, col) (reference io.py:287-290)."""
        fcol, frow = K.affine_colrow(self.affine, x, y)
        return math.floor(frow), math.floor(fcol)

    def _gather_window(self, win, fill):
        """Fetch the window's pixels from the corpus: tile-key pruned
        filter → local mosaic (the Raster.read analog of io.py:292-362)."""
        from pyspark.sql import functions as F

        tiles, dataset, m = self._corpus
        (r0, r1), (c0, c1) = win
        tr0, tr1 = math.floor(r0 / m["tile_h"]), math.floor((r1 - 1) / m["tile_h"])
        tc0, tc1 = math.floor(c0 / m["tile_w"]), math.floor((c1 - 1) / m["tile_w"])
        rows = (
            tiles.filter(
                (F.col("dataset") == dataset)
                & F.col("tile_row").between(tr0, tr1)
                & F.col("tile_col").between(tc0, tc1)
            )
            .select("tile_col", "tile_row", "bytes", "fmt")
            .collect()
        )
        out = np.full((r1 - r0, c1 - c0), fill, dtype=np.float64)
        for row in rows:
            block = np.asarray(
                C.decode_tile(bytes(row["bytes"]), row["fmt"]), dtype=np.float64
            )
            tr, tc = row["tile_row"], row["tile_col"]
            rr0 = max(r0, tr * m["tile_h"])
            rr1 = min(r1, tr * m["tile_h"] + block.shape[0])
            cc0 = max(c0, tc * m["tile_w"])
            cc1 = min(c1, tc * m["tile_w"] + block.shape[1])
            if rr0 >= rr1 or cc0 >= cc1:
                continue
            out[rr0 - r0 : rr1 - r0, cc0 - c0 : cc1 - c0] = block[
                rr0 - tr * m["tile_h"] : rr1 - tr * m["tile_h"],
                cc0 - tc * m["tile_w"] : cc1 - tc * m["tile_w"],
            ]
        return out

    def read(self, bounds=None, window=None, masked=False, boundless=True):
        """Windowed read returning a new in-memory Raster with shifted
        affine (reference io.py:292-362)."""
        if bounds and window:
            raise ValueError("Specify either bounds or window")
        if bounds:
            win = K.bounds_window(bounds, self.affine)
        elif window:
            win = window
        else:
            raise ValueError("Specify either bounds or window")
        if not boundless and K.beyond_extent(win, self.shape):
            raise ValueError(
                "Window/bounds is outside dataset extent, boundless reads "
                "are disabled"
            )
        nodata = self.nodata
        if nodata is None:
            nodata = -999.0  # io.py:331-340
            warnings.warn(
                "Setting nodata to -999; specify nodata explicitly",
                NodataWarning,
            )
        if self.array is not None:
            new_array = K.boundless_array(self.array, win, nodata, masked=masked)
        else:
            new_array = self._gather_window(win, nodata)
            if masked:
                new_array = np.ma.MaskedArray(
                    new_array, mask=(new_array == nodata)
                )
        return Raster(
            np.asarray(new_array), K.window_affine(win, self.affine), nodata
        ) if not masked else _masked_raster(
            new_array, K.window_affine(win, self.affine), nodata
        )

    def __enter__(self):
        return self

    def __exit__(self, *args):
        pass


def _masked_raster(arr, affine, nodata):
    r = Raster(np.ma.getdata(arr), affine=affine, nodata=nodata)
    r.array = arr if isinstance(arr, np.ma.MaskedArray) else np.ma.MaskedArray(
        arr, mask=(arr == nodata)
    )
    return r
