package graft.tools

import org.apache.spark.sql.catalyst.util.GenericArrayData

import graft.expr.{HyperplaneBands, Mix64, SketchKernels}

/** Microbench for the HyperplaneBands kernel: precomputed plane-weight table
  * vs the previous in-loop derivation (2 Mix64 calls per multiply-add, i.e.
  * bands x rows x dims x 2 mixes per row). Driver-side, no Spark session —
  * isolates the kernel from plan/scan cost. Deterministic input (Mix64-
  * derived vectors), results asserted equal between the two paths.
  *
  *   runMain graft.tools.KernelBench [nRows] [bands] [rowsPerBand] [dims]
  */
object KernelBench {

  /** The pre-optimization formulation (weights derived per multiply-add) —
    * kept ONLY for this comparison; the engine uses the table path.
    */
  private def inLoopBands(vec: GenericArrayData, bands: Int, rows: Int,
      dims: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < rows) {
        val planeSeed = Mix64.mix((b * rows + r).toLong)
        var dot = 0.0
        var d = 0
        while (d < dims) {
          dot += vec.getFloat(d).toDouble *
            (Mix64.mix(planeSeed ^ Mix64.mix(d.toLong)).toDouble / 9.223372036854776e18)
          d += 1
        }
        key = (key << 1) | (if (dot >= 0) 1L else 0L)
        r += 1
      }
      out(b) = Mix64.mix(Mix64.mix(b.toLong) ^ key)
      b += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val nRows = if (args.length > 0) args(0).toInt else 200000
    val bands = if (args.length > 1) args(1).toInt else 16
    val rows = if (args.length > 2) args(2).toInt else 16
    val dims = if (args.length > 3) args(3).toInt else 64

    val vecs = Array.tabulate(math.min(nRows, 1024)) { i =>
      new GenericArrayData(Array.tabulate(dims)(d =>
        (Mix64.mix(i.toLong * 65537 + d).toDouble / 9.2e18).toFloat))
    }
    val planes = HyperplaneBands.planes(bands, rows, dims)

    def time(tag: String)(f: Int => Array[Long]): Double = {
      // warm-up then 3 reps, best rep (JIT + steady state)
      var sink = 0L
      (0 until nRows / 4).foreach(i => sink ^= f(i % vecs.length)(0))
      val secs = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        var i = 0
        while (i < nRows) { sink ^= f(i % vecs.length)(0); i += 1 }
        (System.nanoTime() - t0) / 1e9
      }.min
      require(sink != 42, "sink") // keep the loop un-eliminable
      println(f"$tag: $secs%.3f s (${nRows / secs}%.0f rows/s)")
      secs
    }

    // equality check: the table path must reproduce the in-loop signatures
    vecs.take(8).foreach { v =>
      val a = SketchKernels.hyperplaneBands(v, bands, rows, dims, true, planes)
        .asInstanceOf[GenericArrayData].toLongArray()
      val b = inLoopBands(v, bands, rows, dims)
      require(java.util.Arrays.equals(a, b), "plane-table kernel diverged")
    }

    val tOld = time("in-loop weights ")(i => inLoopBands(vecs(i), bands, rows, dims))
    val tNew = time("plane table     ")(i =>
      SketchKernels.hyperplaneBands(vecs(i), bands, rows, dims, true, planes)
        .asInstanceOf[GenericArrayData].toLongArray())
    println(f"""{"metric":"hyperplane_kernel_speedup","value":${tOld / tNew}%.2f,"unit":"x","rows":$nRows,"bands":$bands,"rowsPerBand":$rows,"dims":$dims}""")
  }
}
