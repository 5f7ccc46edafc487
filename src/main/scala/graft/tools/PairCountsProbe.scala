package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r16): A/B the co-occurrence pair-count kernel that feeds
  * the whole graph family (suppEdges / partPairCounts — ~15 contract
  * queries pay it per invocation). Candidates must be bit-identical:
  * exact long pairs, x < y, count per pair.
  * Usage: runMain graft.tools.PairCountsProbe [sfDir]
  */
object PairCountsProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val li = spark.read.parquet(s"$dir/lineitem.parquet")

    def time(name: String)(body: => Unit): Unit = {
      body // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-32s median=${ts.sorted.apply(1)}%.3f  all=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // current: typed groupByKey + flatMapGroups
    def cur: DataFrame = graft.ops.CoOccur.pairCounts(li, "l_orderkey", "l_suppkey")

    // B: SQL collect_set (ObjectHashAggregate, partial merge) + typed flatMap expansion
    def viaCollectSet: DataFrame = {
      li.select(col("l_orderkey").cast("long"), col("l_suppkey").cast("long"))
        .groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_suppkey")).as("items"))
        .select(col("items"))
        .as[Array[Long]]
        .flatMap { items0 =>
          val items = items0.sorted
          for { i <- items.indices.iterator; j <- (i + 1 until items.length).iterator }
            yield (items(i), items(j))
        }
        .toDF("x", "y")
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
    }

    // C: pre-distinct then typed groupByKey (fewer rows into the group shuffle)
    def viaDistinct: DataFrame = {
      li.select(col("l_orderkey").cast("long").as("g"), col("l_suppkey").cast("long").as("i"))
        .distinct()
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (_, it) =>
          val items = it.map(_._2).toArray.sorted
          for { i <- items.indices.iterator; j <- (i + 1 until items.length).iterator }
            yield (items(i), items(j))
        }
        .toDF("x", "y")
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
    }

    // D (r17): pure-codegen self-join — the oracle twin's shape. distinct
    // (group, item) once, self-join on the group key with x < y, count.
    // No typed boundary at all; ~2× the expansion rows of flatMapGroups
    // (the join probes k² and filters) but every operator whole-stage.
    def viaSelfJoin: DataFrame = {
      val os = li.select(col("l_orderkey").cast("long").as("g"),
        col("l_suppkey").cast("long").as("i")).distinct()
      os.as("a").join(os.as("b"),
          col("a.g") === col("b.g") && col("a.i") < col("b.i"))
        .select(col("a.i").as("x"), col("b.i").as("y"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
    }

    // E (r17): self-join reusing ONE distinct via localCheckpoint (the
    // distinct's shuffle paid once, both join sides read blocks).
    def viaSelfJoinCk: DataFrame = {
      val os = li.select(col("l_orderkey").cast("long").as("g"),
        col("l_suppkey").cast("long").as("i")).distinct()
        .localCheckpoint(true)
      val out = os.as("a").join(os.as("b"),
          col("a.g") === col("b.g") && col("a.i") < col("b.i"))
        .select(col("a.i").as("x"), col("b.i").as("y"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint(true)
      graft.ops.Checkpoints.release(os)
      out
    }

    // sanity: identical results
    val a = cur.orderBy("x", "y").collect()
    val b = viaCollectSet.orderBy("x", "y").collect()
    val c = viaDistinct.orderBy("x", "y").collect()
    val d = viaSelfJoin.orderBy("x", "y").collect()
    val e = viaSelfJoinCk.orderBy("x", "y").collect()
    println(s"rows cur=${a.length} collectSet=${b.length} distinct=${c.length} " +
      s"selfjoin=${d.length} selfjoinCk=${e.length} " +
      s"equalB=${a.sameElements(b)} equalC=${a.sameElements(c)} " +
      s"equalD=${a.sameElements(d)} equalE=${a.sameElements(e)}")

    for (_ <- 1 to 2) {
      time("pairCounts current")(noop(cur))
      time("pairCounts collect_set")(noop(viaCollectSet))
      time("pairCounts pre-distinct")(noop(viaDistinct))
      time("pairCounts self-join")(noop(viaSelfJoin))
      time("pairCounts self-join ckpt")(noop(viaSelfJoinCk))
    }
    spark.stop()
  }
}
