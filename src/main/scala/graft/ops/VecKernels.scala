package graft.ops

/** Serializable holder for the compiled per-vector kernels that task
  * closures capture directly (a plain `object` reference inside a Spark
  * closure must itself serialize — this one carries no state, so it
  * always does). Batch callers go through the [[Similarity]] forwarders;
  * streaming ([[graft.streaming.StatefulKmeans]]) and typed-Dataset hot
  * loops reference this object. */
private[graft] object VecKernels extends Serializable {

  /** Nearest-centroid argmin on the exact 1e-12 grid distance — ties
    * keep the first (= smallest cluster id in a sorted codebook); the
    * distance is the associative long grid sum every similarity kernel
    * in the repo uses, so assignment bits can never depend on the
    * engine, the partitioning, or batch-vs-streaming. */
  def argminCell(cb: Array[(Int, Array[Double])],
                 e: Array[Float]): (Int, Long) = {
    var bestCid = -1; var bestD = Long.MaxValue
    var ci = 0
    while (ci < cb.length) {
      val cv = cb(ci)._2
      var s = 0L; var i = 0
      while (i < e.length) {
        val d = e(i).toDouble - cv(i)
        s += math.floor(d * d * 1e12 + 0.5).toLong
        i += 1
      }
      if (s < bestD) { bestD = s; bestCid = cb(ci)._1 }
      ci += 1
    }
    (bestCid, bestD)
  }

  /** PQ sub-codes: per subspace, the POSITION (index into the
    * label-sorted codebook) of the nearest codeword slice on the exact
    * 1e-12 grid, ties to the smaller position — THE encode loop, shared
    * by [[Similarity.pqAdcTopK]], [[Similarity.ivfPqTopK]] and the
    * persisted [[VecIndex]] codes table, so a stored code can never
    * differ from a recomputed one. */
  def pqCodes(cb: Array[(Int, Array[Double])], e: Array[Float],
              subDims: Int): Array[Int] = {
    val m = e.length / subDims
    Array.tabulate(m) { sub =>
      var best = -1; var bestD = Long.MaxValue
      var ci = 0
      while (ci < cb.length) {
        val cv = cb(ci)._2
        var s = 0L; var i = sub * subDims
        val end = (sub + 1) * subDims
        while (i < end) {
          val d = e(i).toDouble - cv(i)
          s += math.floor(d * d * 1e12 + 0.5).toLong
          i += 1
        }
        if (s < bestD) { bestD = s; best = ci }
        ci += 1
      }
      best
    }
  }

  /** Squared-norm on the exact 1e-12 grid — shared by the cosine read
    * paths and the [[VecIndex]] builder (stored as `nvl`). */
  def normGrid(e: Array[Float]): Long = {
    var nv = 0L; var i = 0
    while (i < e.length) {
      nv += math.floor(e(i).toDouble * e(i).toDouble * 1e12 + 0.5).toLong
      i += 1
    }
    nv
  }
}
