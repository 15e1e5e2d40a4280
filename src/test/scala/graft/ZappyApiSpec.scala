package graft

import org.scalatest.funsuite.AnyFunSuite

/** The zappy-named facade (graft.api.Zappy): every reference entry point
  * resolves and composes — the mechanical-port seam a zappy user crosses. */
class ZappyApiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("from_ndarray → ufunc → to_zarr → from_zarr → asndarray roundtrip") {
    import graft.api.Zappy
    val dense = Array.tabulate(6, 4)((i, j) => (i * 4 + j).toDouble)
    val m = Zappy.from_ndarray(spark, dense)
    val store = "/root/repo/target/tmp/zappy_api_roundtrip"
    graft.zarr.Zarr.delete(store, recursive = true)
    Zappy.to_zarr(m.log1p_, store, 6, 4, 3, 2)
    val back = Zappy.asndarray(Zappy.from_zarr(spark, store), 6, 4)
    for (i <- 0 until 6; j <- 0 until 4)
      assert(math.abs(back(i)(j) - math.log1p(dense(i)(j))) < 1e-12)
  }

  test("zeros/ones constructors carry the zappy shape semantics") {
    import graft.api.Zappy
    val z = Zappy.asndarray(Zappy.zeros(spark, 3, 3), 3, 3)
    val o = Zappy.asndarray(Zappy.ones(spark, 3, 3), 3, 3)
    assert(z.flatten.forall(_ == 0.0) && o.flatten.forall(_ == 1.0))
  }

  test("group-member open: from_zarr(store, key) reads an anndata layout") {
    import graft.api.Zappy
    val store = "/root/repo/target/tmp/zappy_api_group"
    graft.zarr.Zarr.delete(store, recursive = true)
    val m = Zappy.from_ndarray(spark, Array.tabulate(4, 2)((i, j) => (i + j).toDouble))
    Zappy.to_zarr(m, s"$store#X", 4, 2, 2, 2)
    val back = Zappy.asndarray(Zappy.from_zarr(spark, store, "X"), 4, 2)
    assert(back(3)(1) == 4.0)
  }

  test("rank-3 facade: to_zarr_nd → from_zarr_nd roundtrip, group key navigation") {
    import graft.api.Zappy
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (for (i <- 0 until 5; j <- 0 until 4; k <- 0 until 3)
      yield (i.toLong, j.toLong, k.toLong, (i * 100 + j * 10 + k).toDouble))
      .toDF("i0", "i1", "i2", "v")
    val store = "/root/repo/target/tmp/zappy_api_cube"
    graft.zarr.Zarr.delete(store, recursive = true)
    Zappy.to_zarr_nd(df, s"$store/T", Seq(5L, 4L, 3L), Seq(2, 2, 2))
    // direct open and group-key open see the same cells (group metadata
    // created the way any real group write does)
    graft.zarr.Zarr.ensureGroupMeta(store, Seq("T"), format = 2)
    val direct = Zappy.from_zarr_nd(spark, s"$store/T")
      .orderBy("i0", "i1", "i2").collect()
    assert(direct.sameElements(df.orderBy("i0", "i1", "i2").collect()))
    val viaKey = Zappy.from_zarr_nd(spark, store, "T")
      .orderBy("i0", "i1", "i2").collect()
    assert(viaKey.sameElements(direct))
  }

  test("to_zarr_nd exposes compressor/fill/dtype/nested (r18 ADVICE fix)") {
    import graft.api.Zappy
    import spark.implicits._
    val df = (for (i <- 0 until 3; j <- 0 until 2; k <- 0 until 2)
      yield (i.toLong, j.toLong, k.toLong, (i * 4 + j * 2 + k).toDouble))
      .toDF("i0", "i1", "i2", "v")
    // uncompressed f4, non-zero fill, DOT-keyed v3 (every choice the old
    // facade hard-wired away)
    val store = "/root/repo/target/tmp/zappy_api_ndopts"
    graft.zarr.Zarr.delete(store, recursive = true)
    Zappy.to_zarr_nd(df, store, Seq(4L, 2L, 2L), Seq(2, 2, 2), format = 3,
      comp = "none", dtype = "<f4", fill = -1.0, nested = Some(false))
    val metaJson = new String(graft.zarr.Zarr.readBytes(s"$store/zarr.json"), "UTF-8")
    assert(metaJson.contains("\"float32\""), metaJson)
    assert(!metaJson.contains("gzip") && !metaJson.contains("blosc") &&
      !metaJson.contains("zstd"), metaJson)
    assert(metaJson.contains("\"separator\": \".\""), metaJson)
    // dot-keyed chunk objects on disk, and i0 ∈ [3, 4) never written →
    // that band reads back as the declared fill
    assert(graft.zarr.Zarr.exists(s"$store/c.0.0.0"), "expected dot-keyed chunks")
    val back = Zappy.from_zarr_nd(spark, store)
    assert(back.filter($"i0" === 3L && $"v" === -1.0).count() == 4L)
    val vals = back.filter($"i0" < 3L).orderBy("i0", "i1", "i2").collect()
    assert(vals.sameElements(df.orderBy("i0", "i1", "i2").collect()))
  }
}
