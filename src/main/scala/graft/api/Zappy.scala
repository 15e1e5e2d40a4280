package graft.api

import org.apache.spark.sql.SparkSession

import graft.array.{ZLocal, ZMatrix}
import graft.zarr.Zarr

/** The zappy-named entry points, one to one — the seam a reference user
  * crosses first. zappy's public module surface (lasersonlab/zappy
  * `zappy/base.py`: `from_zarr`, `to_zarr`, `from_ndarray`, `asarray`,
  * `zeros`, `ones`) maps onto graft's coordinate-form engine with the
  * SAME names and argument shapes, so a caller can port
  * `zappy.base.from_zarr(store)` to `Zappy.from_zarr(spark, store)`
  * mechanically. Everything returns/consumes [[graft.array.ZMatrix]],
  * whose method surface mirrors the ndarray ops (README table).
  *
  * Deliberately a THIN facade: every function delegates to the public
  * Zarr/ZMatrix API — no second implementation to drift. */
object Zappy {

  /** zappy `from_zarr(store[, key])`: open a Zarr array (or a group
    * member via `store#key` / the explicit key overload) as a
    * distributed matrix, one partition per chunk. */
  def from_zarr(spark: SparkSession, store: String): ZMatrix =
    Zarr.read(spark, store)
  def from_zarr(spark: SparkSession, store: String, key: String): ZMatrix =
    Zarr.read(spark, store, key)

  /** zappy `arr.to_zarr(store, chunks)`: write the matrix as a Zarr v2
    * array (set `format = 3` for v3, compressors via `comp`). */
  def to_zarr(m: ZMatrix, store: String, rows: Long, cols: Long,
              chunkRows: Int, chunkCols: Int, format: Int = 2,
              comp: String = ""): Unit =
    Zarr.write(m, store, rows, cols, chunkRows, chunkCols,
      format = format, comp = comp)

  /** zappy `from_ndarray(sc, arr, chunks)`: distribute a local dense
    * array (chunking is Spark's partitioning — no explicit grid). */
  def from_ndarray(spark: SparkSession, arr: Array[Array[Double]]): ZMatrix =
    ZMatrix.fromDense(spark, arr)

  /** zappy `np.asarray(arr)` / `asndarray`: materialize locally. */
  def asndarray(m: ZMatrix, rows: Int, cols: Int,
                fill: Double = 0.0): Array[Array[Double]] =
    ZLocal.toDense(m, rows, cols, fill)

  /** zappy `zeros/ones(sc, shape, chunks)`. */
  def zeros(spark: SparkSession, rows: Long, cols: Long): ZMatrix =
    ZMatrix.zeros(spark, rows, cols)
  def ones(spark: SparkSession, rows: Long, cols: Long): ZMatrix =
    ZMatrix.ones(spark, rows, cols)

  // ---- rank ≥ 3 (zappy's ZappyArray is N-D in principle; Z35/A55) ----
  // The tensor face returns the coordinate FRAME (i0…i{N−1}, v) rather
  // than a ZMatrix: at rank ≥ 3 every ufunc is a column expression and
  // every axis reduction a groupBy over that frame directly.

  /** zappy `from_zarr(store[, key])` for a rank-N (≥ 3) array — group
    * navigation shared with the 2-D reader (`store#key` or the explicit
    * key overload). */
  def from_zarr_nd(spark: SparkSession,
                   store: String): org.apache.spark.sql.DataFrame =
    graft.zarr.ZarrNd.read(spark, store)
  def from_zarr_nd(spark: SparkSession, store: String,
                   key: String): org.apache.spark.sql.DataFrame =
    graft.zarr.ZarrNd.read(spark,
      Zarr.resolveArray(store, Some(key).filter(_.nonEmpty)))

  /** zappy `arr.to_zarr(store, chunks)` at rank N (`format = 3` for the
    * stock zarr-python v3 layout). The full ZarrNd.write surface is
    * exposed (r18 ADVICE fix — the facade used to hard-wire zlib, f8,
    * fill 0 and format-coupled key nesting):
    *  - `comp`: "" = zlib/gzip (the default), "none" = uncompressed,
    *    or "blosc"/"zstd";
    *  - `dtype`/`fill`: any dtype the N-D engine writes, any fill;
    *  - `nested`: None = follow the format's zarr-python default ("/"
    *    keys for v3, "." for v2); Some(b) forces the separator (e.g. a
    *    dot-keyed v3 store). */
  def to_zarr_nd(df: org.apache.spark.sql.DataFrame, store: String,
                 shape: Seq[Long], chunks: Seq[Int], format: Int = 2,
                 comp: String = "", dtype: String = "<f8",
                 fill: Double = 0.0, nested: Option[Boolean] = None): Unit =
    graft.zarr.ZarrNd.write(df, store, shape, chunks,
      dtype = dtype, fill = fill,
      nested = nested.getOrElse(format == 3), format = format,
      comp = if (comp == "none") "" else comp,
      zlib = comp.isEmpty)
}
