package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Classic technical-indicator folds (RSI, MACD) — per-key sequential
  * recurrences in event-time order, distributed with the same
  * secondary-sort pattern as [[Ewma]]: repartition by key, external sort
  * within partitions by (key, time, seq), ONE streaming pass with O(1)
  * state per key. At 100 TB a key's full history flows through the sort
  * spill, never through executor memory.
  *
  * Determinism story (same as Ewma): the recurrences are genuinely
  * order-dependent, so instead of an associativity grid the contract is
  * an IDENTICAL IEEE expression sequence in an identical total order on
  * both engines. Smoothing constants cross into the DuckDB twin via
  * [[Det.dblLit]] (quote-then-cast — bare DECIMAL literals mis-round).
  * The reference platform computes none of these; they are the standard
  * quant-signal extensions of its SMA/EWMA family (SURVEY §2.5).
  */
object Indicators {

  /** Wilder RSI, final value per key. Deltas d_i = x_i − x_{i−1}; gains
    * `d>0 ? d : 0`, losses `d<0 ? −d : 0` (strict comparisons so no −0.0
    * can enter the fold); both averages are independent Wilder smoothings
    * `s ← x·α + s·(1−α)` (α = 1/period) seeded with the first
    * gain/loss. RSI = 100 − 100/(1 + G/L), 100 when L = 0. Keys with a
    * single tick (no delta) drop out.
    *
    * Emits (key, n_deltas, avg_gain, avg_loss, rsi).
    */
  def rsiPerKey(ticks: DataFrame, key: String, time: String, seq: String,
                value: String, period: Int = 14): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val a = 1.0 / period
    val b = 1.0 - a
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        new Iterator[(String, Long, Double, Double, Double)] {
          private var cur: String = null
          private var prev = 0.0
          private var g = 0.0
          private var l = 0.0
          private var nd = 0L
          private var pending: Option[(String, Long, Double, Double, Double)] = None
          private var done = false
          private def out: Option[(String, Long, Double, Double, Double)] =
            if (nd == 0L) None
            else {
              val rsi = if (l == 0.0) 100.0 else 100.0 - 100.0 / (1.0 + g / l)
              Some((cur, nd, g, l, rsi))
            }
          private def roll(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (k, _, _, x) = it.next()
              if (cur == null) { cur = k; prev = x; nd = 0L }
              else if (k == cur) {
                val d = x - prev; prev = x
                val gn = if (d > 0) d else 0.0
                val ln = if (d < 0) -d else 0.0
                if (nd == 0L) { g = gn; l = ln }
                else { g = gn * a + g * b; l = ln * a + l * b }
                nd += 1L
              } else { pending = out; cur = k; prev = x; nd = 0L }
            }
            if (pending.isEmpty && !it.hasNext && cur != null && !done) {
              pending = out; done = true
            }
          }
          def hasNext: Boolean = { roll(); pending.nonEmpty }
          def next(): (String, Long, Double, Double, Double) = {
            roll(); val r = pending.get; pending = None; r
          }
        }
      }
      .toDF(key, "n_deltas", "avg_gain", "avg_loss", "rsi")
  }

  /** MACD, final state per key: fast/slow EMAs (α = 2/(n+1)) seeded with
    * the first observation, signal line = EMA of the macd series seeded
    * with the first macd (≡ 0.0), all three recurrences advanced in
    * lockstep per tick — the signal update reads the CURRENT tick's new
    * EMAs, mirrored operand-for-operand in the oracle's struct-
    * accumulator `list_reduce`.
    *
    * Emits (key, n_ticks, ema_fast, ema_slow, macd, signal, histogram).
    */
  def macdPerKey(ticks: DataFrame, key: String, time: String, seq: String,
                 value: String, fast: Int = 12, slow: Int = 26,
                 signal: Int = 9): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val af = 2.0 / (fast + 1); val bf = 1.0 - af
    val as = 2.0 / (slow + 1); val bs = 1.0 - as
    val ag = 2.0 / (signal + 1); val bg = 1.0 - ag
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        new Iterator[(String, Long, Double, Double, Double, Double, Double)] {
          private var cur: String = null
          private var ef = 0.0
          private var es = 0.0
          private var sg = 0.0
          private var n = 0L
          private var pending: Option[(String, Long, Double, Double, Double, Double, Double)] = None
          private var done = false
          private def out = {
            val macd = ef - es
            Some((cur, n, ef, es, macd, sg, macd - sg))
          }
          private def roll(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (k, _, _, x) = it.next()
              if (cur == null) { cur = k; ef = x; es = x; sg = 0.0; n = 1L }
              else if (k == cur) {
                val nf = x * af + ef * bf
                val ns = x * as + es * bs
                sg = (nf - ns) * ag + sg * bg
                ef = nf; es = ns; n += 1L
              } else { pending = out; cur = k; ef = x; es = x; sg = 0.0; n = 1L }
            }
            if (pending.isEmpty && !it.hasNext && cur != null && !done) {
              pending = out; done = true
            }
          }
          def hasNext: Boolean = { roll(); pending.nonEmpty }
          def next(): (String, Long, Double, Double, Double, Double, Double) = {
            roll(); val r = pending.get; pending = None; r
          }
        }
      }
      .toDF(key, "n_ticks", "ema_fast", "ema_slow", "macd", "signal", "histogram")
  }

  /** Local-level (random-walk-plus-noise) Kalman filter per key — the
    * steady-state-adaptive smoother the EMA family can't express: the
    * gain k_t = P_t/(P_t+R) ADAPTS from 1 (trust the first ticks) toward
    * the Riccati fixpoint as evidence accumulates, instead of a fixed α.
    * Recurrence per tick z (after seeding x=z₀, P=p0):
    *   P ← P + q;  k ← P/(P+R);  x ← x + k·(z−x);  P ← (1−k)·P
    * — the 1-D Kalman predict/update (Kalman 1960; Harvey's local level
    * model). Emits the FINAL (n_ticks, level, gain, p_var) per key.
    *
    * Determinism: the fold is the identical IEEE double sequence in the
    * identical (time, seq) total order on both engines — the DuckDB twin
    * replays it as a snapshot-safe `list_reduce` (each struct field
    * reads only PRE-update state, recomputing p+q / gain inline), with
    * constants crossing via [[Det.dblLit]]. Same secondary-sort
    * distribution as [[macdPerKey]]: one Exchange on the key, O(1)
    * state per key, streaming iterator (no per-key materialization).
    */
  def kalmanPerKey(ticks: DataFrame, key: String, time: String, seq: String,
                   value: String, q: Double, r: Double,
                   p0: Double): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        new Iterator[(String, Long, Double, Double, Double)] {
          private var cur: String = null
          private var x = 0.0
          private var p = 0.0
          private var k = 0.0
          private var n = 0L
          private var pending: Option[(String, Long, Double, Double, Double)] = None
          private var done = false
          private def out = Some((cur, n, x, k, p))
          private def roll(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (kk, _, _, z) = it.next()
              if (cur == null) { cur = kk; x = z; p = p0; k = 0.0; n = 1L }
              else if (kk == cur) {
                val p1 = p + q
                k = p1 / (p1 + r)
                x = x + k * (z - x)
                p = (1.0 - k) * p1
                n += 1L
              } else { pending = out; cur = kk; x = z; p = p0; k = 0.0; n = 1L }
            }
            if (pending.isEmpty && !it.hasNext && cur != null && !done) {
              pending = out; done = true
            }
          }
          def hasNext: Boolean = { roll(); pending.nonEmpty }
          def next(): (String, Long, Double, Double, Double) = {
            roll(); val r0 = pending.get; pending = None; r0
          }
        }
      }
      .toDF(key, "n_ticks", "level", "gain", "p_var")
  }

  /** Adaptive EWMA — the generalized fold `s ← s + sc_t·(x_t − s)` where
    * the smoothing coefficient `sc` is a PRECOMPUTED per-row column
    * (KAMA's efficiency-ratio schedule, volatility-scaled alphas, …),
    * seeded with the first observation. Single-state, so the DuckDB
    * struct-fold oracle is robust under both in-place and snapshot
    * field-evaluation semantics (unlike Holt's mutually-dependent
    * pair). Same secondary-sort distribution as [[Ewma]].
    *
    * Emits (key, n_ticks, adaptive).
    */
  def adaptiveEwmaPerKey(ticks: DataFrame, key: String, time: String,
                         seq: String, value: String, scCol: String): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"), col(scCol).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        new Iterator[(String, Long, Double)] {
          private var cur: String = null
          private var s = 0.0
          private var n = 0L
          private var pending: Option[(String, Long, Double)] = None
          private var done = false
          private def roll(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (k, _, _, x, sc) = it.next()
              if (cur == null) { cur = k; s = x; n = 1L }
              else if (k == cur) { s = s + sc * (x - s); n += 1L }
              else { pending = Some((cur, n, s)); cur = k; s = x; n = 1L }
            }
            if (pending.isEmpty && !it.hasNext && cur != null && !done) {
              pending = Some((cur, n, s)); done = true
            }
          }
          def hasNext: Boolean = { roll(); pending.nonEmpty }
          def next(): (String, Long, Double) = {
            roll(); val r = pending.get; pending = None; r
          }
        }
      }
      .toDF(key, "n_ticks", "adaptive")
  }

  /** Holt linear-trend smoothing with an h-step forecast, final state per
    * key: level `l ← α·x + (1−α)·(l + b)`, trend `b ← β·(l_new − l) +
    * (1−β)·b`, seeded l = x₀, b = 0. Forecast = l + h·b.
    *
    * Oracle twin: IndicatorQueries.holtSql (`holt_forecast`). The
    * mutually-dependent level/trend pair defeats a struct_pack
    * accumulator (struct fields alias the accumulator in place on
    * reduce steps ≥ 2), but a LIST accumulator `[lv, tr]` constructs
    * fresh on every step, so both elements read the untouched old
    * state — bit-exact against this fold with the level expression
    * inlined into the trend element. IndicatorsSpec additionally proves
    * naive-model bit-equality and order-insensitivity in-engine.
    */
  def holtPerKey(ticks: DataFrame, key: String, time: String, seq: String,
                 value: String, alpha: Double = 0.2, beta: Double = 0.1,
                 horizon: Int = 5): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val a = alpha; val na = 1.0 - alpha
    val b = beta; val nb = 1.0 - beta
    val h = horizon.toDouble
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        new Iterator[(String, Long, Double, Double, Double)] {
          private var cur: String = null
          private var lv = 0.0
          private var tr = 0.0
          private var n = 0L
          private var pending: Option[(String, Long, Double, Double, Double)] = None
          private var done = false
          private def out = Some((cur, n, lv, tr, lv + h * tr))
          private def roll(): Unit = {
            while (pending.isEmpty && it.hasNext) {
              val (k, _, _, x) = it.next()
              if (cur == null) { cur = k; lv = x; tr = 0.0; n = 1L }
              else if (k == cur) {
                val nl = x * a + (lv + tr) * na
                tr = (nl - lv) * b + tr * nb
                lv = nl; n += 1L
              } else { pending = out; cur = k; lv = x; tr = 0.0; n = 1L }
            }
            if (pending.isEmpty && !it.hasNext && cur != null && !done) {
              pending = out; done = true
            }
          }
          def hasNext: Boolean = { roll(); pending.nonEmpty }
          def next(): (String, Long, Double, Double, Double) = {
            roll(); val r = pending.get; pending = None; r
          }
        }
      }
      .toDF(key, "n_ticks", "level", "trend", "forecast")
  }

  /** Time-split evaluation of the Holt forecaster — the train→eval
    * closure for [[holtPerKey]]: per key, fit level/trend on the first
    * ⌊4n/5⌋ observations (the SAME fold bits as holtPerKey over that
    * prefix), forecast h = 1..horizon steps, and report per-step
    * absolute errors next to the last-observation persistence baseline.
    * One row per (key, h) — no float aggregation anywhere, every error
    * is a per-row IEEE |sub| on fold-exact operands, so the DuckDB
    * list-slice twin reproduces each bit. Per-key series buffer is the
    * usual time-bounded-per-instrument justification; the key axis is
    * the partitioned one. */
  def holtEvalPerKey(ticks: DataFrame, key: String, time: String, seq: String,
                     value: String, alpha: Double, beta: Double,
                     horizon: Int): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val a = alpha; val na = 1.0 - alpha
    val b = beta; val nb = 1.0 - beta
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Double, Double, Double, Double)]
        var cur: String = null
        val xs = scala.collection.mutable.ArrayBuilder.make[Double]
        def close(): Unit = if (cur != null) {
          val arr = xs.result()
          val n = arr.length.toLong
          val nTr = n * 4 / 5
          if (nTr >= 1 && nTr < n) {
            var lv = arr(0); var tr = 0.0
            var i = 1
            while (i < nTr) {
              val x = arr(i)
              val nl = x * a + (lv + tr) * na
              tr = (nl - lv) * b + tr * nb
              lv = nl
              i += 1
            }
            val lastObs = arr((nTr - 1).toInt)
            var h = 1
            while (h <= horizon && nTr + h <= n) {
              val fc = lv + h.toDouble * tr
              val actual = arr((nTr + h - 1).toInt)
              out += ((cur, n, nTr, h.toLong, fc, actual,
                math.abs(fc - actual), math.abs(lastObs - actual)))
              h += 1
            }
          }
          xs.clear()
        }
        it.foreach { case (k, _, _, x) =>
          if (cur == null || k != cur) { close(); cur = k }
          xs += x
        }
        close()
        out.iterator
      }
      .toDF(key, "n_ticks", "n_train", "h", "forecast", "actual",
        "abs_err_holt", "abs_err_naive")
  }

  /** Split-conformal 1-step prediction intervals for the Holt forecaster
    * (Vovk's conformal prediction, the Lei et al. JASA'18 split form):
    * per key the series is cut 60/20/20 — the Holt fold runs walk-forward
    * over ALL of it, absolute 1-step residuals |z_j − (ℓ+b)| land in a
    * CALIBRATION set (indices [3n/5, 4n/5)) and a TEST set ([4n/5, n));
    * q̂ = the ⌈0.9·(n_cal+1)⌉-th smallest calibration residual (the
    * finite-sample-valid conformal quantile at 90% target), and the
    * empirical test coverage of ±q̂ is the honesty check. Emits
    * (n_ticks, n_cal, n_test, q_hat, n_covered, coverage) for keys with
    * n_cal ≥ 9 and n_test ≥ 1 (below that the ⌈·⌉ rank exceeds the set).
    *
    * Determinism: residuals are fold-exact doubles, q̂ is an ORDER
    * STATISTIC (a pick, not an interpolation), the coverage test
    * compares identical bits against the unsnapped q̂, and the only
    * divisions are final snapped ratios — so both engines agree
    * bit-for-bit. Same secondary-sort shape as [[holtEvalPerKey]];
    * per-key buffering is bounded by the series length, the same bound
    * every list-fold twin already carries.
    */
  def conformalPerKey(ticks: DataFrame, key: String, time: String,
                      seq: String, value: String, alpha: Double,
                      beta: Double): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    val a = alpha; val na = 1.0 - alpha
    val b = beta; val nb = 1.0 - beta
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Double, Long, Double)]
        var cur: String = null
        val xs = scala.collection.mutable.ArrayBuilder.make[Double]
        def close(): Unit = if (cur != null) {
          val arr = xs.result()
          val n = arr.length.toLong
          val nTr = n * 3 / 5
          val nCalEnd = n * 4 / 5
          if (nTr >= 1 && nCalEnd > nTr && n > nCalEnd) {
            val rs = scala.collection.mutable.ArrayBuffer.empty[Double]
            val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
            var lv = arr(0); var tr = 0.0
            var j = 1
            while (j < n) {
              val z = arr(j)
              val r = math.abs(z - (lv + tr))
              if (j >= nTr && j < nCalEnd) rs += r
              else if (j >= nCalEnd) ts += r
              val nl = z * a + (lv + tr) * na
              tr = (nl - lv) * b + tr * nb
              lv = nl
              j += 1
            }
            val nCal = rs.length.toLong
            val nTest = ts.length.toLong
            if (nCal >= 9 && nTest >= 1) {
              val k = ((nCal + 1) * 9 + 9) / 10
              val qh = rs.toArray.sorted.apply((k - 1).toInt)
              val covered = ts.count(_ <= qh).toLong
              out += ((cur, n, nCal, nTest, qh, covered,
                covered.toDouble / nTest.toDouble))
            }
          }
          xs.clear()
        }
        it.foreach { case (k, _, _, x) =>
          if (cur == null || k != cur) { close(); cur = k }
          xs += x
        }
        close()
        out.iterator
      }
      .toDF(key, "n_ticks", "n_cal", "n_test", "q_hat", "n_covered",
        "coverage")
  }

  /** Split-conformal 1-step intervals for the KALMAN forecaster — the
    * [[conformalPerKey]] protocol (60/20/20 split, order-statistic q̂
    * at 90%, test coverage) with the local-level Kalman one-step
    * predictive mean as the forecaster: the prediction for z_j is the
    * filtered level x_{j−1} (random-walk one-step forecast), so the
    * residual is |z_j − x| BEFORE the update, then the
    * [[kalmanPerKey]] predict/update recurrence advances the state.
    * Same determinism argument: fold-exact doubles, a pick (not an
    * interpolation) for q̂, bit-identical coverage comparisons. */
  def conformalKalmanPerKey(ticks: DataFrame, key: String, time: String,
                            seq: String, value: String, q: Double,
                            r: Double, p0: Double): DataFrame = {
    val spark = ticks.sparkSession
    import spark.implicits._
    ticks
      .select(col(key).cast("string"), col(time), col(seq).cast("long"),
        col(value).cast("double"))
      .as[(String, java.sql.Timestamp, Long, Double)]
      .repartition(col(key))
      .sortWithinPartitions(col(key), col(time), col(seq))
      .mapPartitions { it =>
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Long, Long, Long, Double, Long, Double)]
        var cur: String = null
        val xs = scala.collection.mutable.ArrayBuilder.make[Double]
        def close(): Unit = if (cur != null) {
          val arr = xs.result()
          val n = arr.length.toLong
          val nTr = n * 3 / 5
          val nCalEnd = n * 4 / 5
          if (nTr >= 1 && nCalEnd > nTr && n > nCalEnd) {
            val rs = scala.collection.mutable.ArrayBuffer.empty[Double]
            val ts = scala.collection.mutable.ArrayBuffer.empty[Double]
            var x = arr(0); var p = p0
            var j = 1
            while (j < n) {
              val z = arr(j)
              val res = math.abs(z - x)
              if (j >= nTr && j < nCalEnd) rs += res
              else if (j >= nCalEnd) ts += res
              val p1 = p + q
              val k = p1 / (p1 + r)
              x = x + k * (z - x)
              p = (1.0 - k) * p1
              j += 1
            }
            val nCal = rs.length.toLong
            val nTest = ts.length.toLong
            if (nCal >= 9 && nTest >= 1) {
              val k = ((nCal + 1) * 9 + 9) / 10
              val qh = rs.toArray.sorted.apply((k - 1).toInt)
              val covered = ts.count(_ <= qh).toLong
              out += ((cur, n, nCal, nTest, qh, covered,
                covered.toDouble / nTest.toDouble))
            }
          }
          xs.clear()
        }
        it.foreach { case (k, _, _, x) =>
          if (cur == null || k != cur) { close(); cur = k }
          xs += x
        }
        close()
        out.iterator
      }
      .toDF(key, "n_ticks", "n_cal", "n_test", "q_hat", "n_covered",
        "coverage")
  }
}
