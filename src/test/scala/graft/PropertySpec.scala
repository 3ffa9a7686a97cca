package graft

import graft.ops.Launches
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based invariants (SURVEY.md §5.2.3) over generated launch
  * frames: the mart's three-valued-logic identities must hold for ANY
  * input, not just the fixtures. */
class PropertySpec extends SparkSpec {

  /** Raw-scalacheck bridge (no scalatestplus in the dep set): draw n
    * samples from a Gen and run the assertion block on each. */
  private def forAllSampled[A](g: Gen[A], n: Int)(body: A => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  private val rowGen = for {
    year <- Gen.chooseNum(1990, 2030)
    success <- Gen.oneOf(Some(true), Some(false), None)
  } yield (year, success)

  private val frameGen = Gen.listOfN(40, rowGen)

  test("mart invariants hold on arbitrary inputs") {
    import spark.implicits._
    forAllSampled(frameGen, 15) { rows =>
      val df = rows.toDF("year", "success")
      val out = Launches.mart(df).collect()
      // successes + failures == launches, rate in [0,100] and non-null
      out.foreach { r =>
        val launches = r.getAs[Long]("launches")
        val s = r.getAs[Long]("successes")
        val f = r.getAs[Long]("failures")
        assert(s + f == launches)
        val rate = r.getAs[java.math.BigDecimal]("success_rate_pct")
        assert(rate != null)
        assert(rate.doubleValue >= 0.0 && rate.doubleValue <= 100.0)
      }
      // total rows preserved
      assert(out.map(_.getAs[Long]("launches")).sum == rows.size)
    }
  }

  test("latest-snapshot dedup is idempotent and keeps one row per key on arbitrary inputs") {
    import spark.implicits._
    val snapGen = Gen.listOfN(60, for {
      id <- Gen.chooseNum(1, 10)
      ts <- Gen.chooseNum(1L, 5L)
    } yield (s"launch$id", java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(ts * 86400)))
    )
    forAllSampled(snapGen, 10) { rows =>
      val df = rows.toDF("launch_id", "load_ts")
        .withColumn("date_utc", lit(null).cast("timestamp"))
      val once = Launches.latestSnapshot(df)
      val twice = Launches.latestSnapshot(once)
      assert(once.count() == df.select("launch_id").distinct().count())
      assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
    }
  }

  test("TopKAggregator merge is associative/commutative and equals sort-take on arbitrary inputs") {
    import graft.functions.{ScoredKey, TopKAggregator}
    val agg = new TopKAggregator(3)
    val skGen = Gen.listOfN(25, for {
      key <- Gen.chooseNum(1L, 50L)
      score <- Gen.chooseNum(0L, 8L) // small range => plenty of score ties
    } yield ScoredKey(key, score))
    forAllSampled(Gen.zip(skGen, skGen, skGen), 40) { case (xs, ys, zs) =>
      def fold(l: Seq[ScoredKey]) = l.foldLeft(agg.zero)(agg.reduce)
      val (a, b, c) = (fold(xs), fold(ys), fold(zs))
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
      assert(agg.merge(a, b) == agg.merge(b, a))
      // equals the global sort-take on the concatenated input
      val expected = (xs ++ ys ++ zs)
        .sortBy(s => (-s.score, s.key)).take(3).map(_.key)
      assert(agg.finish(agg.merge(agg.merge(a, b), c)) == expected)
    }
  }

  test("TopKPairsAggregator merge is associative/commutative and equals sort-take on arbitrary inputs") {
    import graft.functions.{ScoredKey, TopKPairsAggregator}
    val agg = new TopKPairsAggregator(4)
    val skGen = Gen.listOfN(25, for {
      key <- Gen.chooseNum(1L, 50L)
      score <- Gen.chooseNum(-8L, 8L) // ties + the negated-score (ascending) regime
    } yield ScoredKey(key, score))
    forAllSampled(Gen.zip(skGen, skGen, skGen), 40) { case (xs, ys, zs) =>
      def fold(l: Seq[ScoredKey]) = l.foldLeft(agg.zero)(agg.reduce)
      val (a, b, c) = (fold(xs), fold(ys), fold(zs))
      assert(agg.merge(agg.merge(a, b), c) == agg.merge(a, agg.merge(b, c)))
      assert(agg.merge(a, b) == agg.merge(b, a))
      val expected = (xs ++ ys ++ zs).sortBy(s => (-s.score, s.key)).take(4)
      assert(agg.finish(agg.merge(agg.merge(a, b), c)) == expected)
    }
  }

  test("q55 ntile arithmetic equals the real ntile window for every partition size") {
    // the scalable q55 reconstructs ntile(4) from (position, partition
    // count) instead of running the window over the fact table — the
    // tile-size rule must match Spark's for EVERY n, including n < 4 and
    // every n mod 4 residue
    import spark.implicits._
    val rows = for { n <- 1 to 60; p <- 1 to n } yield (n.toLong, p.toLong)
    val df = rows.toDF("n", "p")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("n")).orderBy(col("p"))
    val base = expr("n div 4")
    val rem = col("n") % 4
    val boundary = rem * (base + 1)
    val formula = when(col("p") <= boundary,
        ceil(col("p").cast("double") / (base + 1).cast("double")))
      .otherwise(rem + ceil((col("p") - boundary).cast("double") /
        greatest(base, lit(1L)).cast("double")))
    val bad = df.withColumn("nt", ntile(4).over(w).cast("long"))
      .withColumn("f", formula.cast("long"))
      .filter(col("nt") =!= col("f"))
    assert(bad.isEmpty, bad.collect().take(5).mkString(","))
  }

  test("mixture water-filling invariants hold on arbitrary inventories") {
    import spark.implicits._
    val invGen = for {
      n <- Gen.chooseNum(1, 12)
      avails <- Gen.listOfN(n, Gen.chooseNum(1L, 10000L))
      budgetFrac <- Gen.chooseNum(0, 130) // up to 130% of total — covers the all-capped case
    } yield (avails, budgetFrac)
    forAllSampled(invGen, 12) { case (avails, budgetFrac) =>
      val total = avails.sum
      val b = total * budgetFrac / 100
      val inv = avails.zipWithIndex
        .map { case (a, i) => (f"s$i%02d", a, 1L) }
        .toDF("source", "avail", "n_docs")
      val t = ops.Mixture.allocate(inv, lit(b)).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("avail"), r.getAs[Long]("target")))
      // (1) never allocate past a source's inventory, never negative
      t.foreach { case (s, avail, target) =>
        assert(target >= 0 && target <= avail, s"$s: target $target vs avail $avail")
      }
      // (2) the budget is met EXACTLY (or the whole corpus taken when it covers it)
      val want = math.min(b, total)
      assert(t.map(_._3).sum == want, s"sum targets ${t.map(_._3).sum} != $want (b=$b total=$total)")
      // (3) water level: any source below a fully-funded one is taken in full
      val maxTarget = t.map(_._3).max
      t.foreach { case (s, avail, target) =>
        if (avail < maxTarget) assert(target == avail, s"$s under the level but not capped")
      }
    }
  }

  test("temperature-mix invariants hold on arbitrary inventories") {
    import spark.implicits._
    val invGen = for {
      n <- Gen.chooseNum(1, 12)
      avails <- Gen.listOfN(n, Gen.chooseNum(0L, 2000000L))
    } yield avails
    forAllSampled(invGen, 12) { avails =>
      val inv = avails.zipWithIndex
        .map { case (a, i) => (f"s$i%02d", a, 1L) }
        .toDF("source", "avail", "n_docs")
      val t = ops.Mixture.temperatureTargets(inv).collect()
        .map(r => (r.getAs[String]("source"), r.getAs[Long]("avail"),
          r.getAs[Long]("weight"), r.getAs[Long]("alloc_tokens")))
      // (1) weight is the EXACT integer sqrt of the inventory
      t.foreach { case (s, avail, w, _) =>
        assert(w * w <= avail && (w + 1) * (w + 1) > avail, s"$s: $w is not isqrt($avail)")
      }
      // (2) the α-budget (total div 4) is hit EXACTLY by the rounding
      val total = avails.sum
      assert(t.map(_._4).sum == total / 4,
        s"sum alloc ${t.map(_._4).sum} != ${total / 4}")
      // (3) largest-remainder never strays past ±1 from weight order:
      // a strictly heavier source can trail a lighter one by at most the
      // single +1 remainder token
      for ((_, _, wi, ai) <- t; (_, _, wj, aj) <- t if wi <= wj)
        assert(ai <= aj + 1, s"alloc order violates weight order: ($wi,$ai) vs ($wj,$aj)")
      // (4) zero-weight sources get nothing (the +1 only lands on rem>0)
      t.foreach { case (s, _, w, a) => if (w == 0) assert(a == 0, s"$s: alloc $a with weight 0") }
    }
  }

  test("pow2 fold inverts log2fp within the fixed-point tolerance on arbitrary values") {
    // the q273 exp primitive against the q231 log primitive: for any
    // x ≥ 1, reconstructing x from its 2^16 fixed-point log2 through the
    // 2^30-scale fractional fold must land within the combined truncation
    // budget (log2fp floors ≤ 2^-16 in the exponent; each of ≤ 16 fold
    // multiplies floors ≤ 2^-30 of the mantissa) — relative error well
    // under 2^-13. A wrong constant or a misindexed bit is off by ≥ 2^-16
    // of the EXPONENT, i.e. orders of magnitude outside this band.
    import org.apache.spark.sql.functions._
    val consts = graft.ops.Text.Pow2FracConsts.mkString("array(", "L, ", "L)")
    val xs = (Seq(1L, 2L, 3L, 7L, 100L, 65535L, 65536L, 1000003L) ++
      (1 to 40).map(i => (i.toLong * 2654435761L) % 1000000000L + 1L)).distinct
    val df = graft.ops.Text.withLog2fp(
      spark.createDataFrame(xs.map(Tuple1(_))).toDF("x"), "x", "lg")
      .withColumn("e", expr("lg div 65536"))
      .withColumn("r", expr("lg % 65536"))
      .withColumn("m", expr(
        s"""aggregate(sequence(1, 16), CAST(1073741824 AS BIGINT),
           |  (m, k) -> CASE WHEN (r div shiftleft(CAST(1 AS BIGINT), 16 - k)) % 2 = 1
           |            THEN (m * element_at($consts, k)) div 1073741824
           |            ELSE m END,
           |  m -> m)""".stripMargin))
      // reconstruction at scale 2^30: m · 2^e (e ≤ 30 for x ≤ 10^9)
      .withColumn("rec", expr("m * shiftleft(CAST(1 AS BIGINT), CAST(e AS INT))"))
      .withColumn("target", expr("x * CAST(1073741824 AS BIGINT)"))
    val bad = df.filter(
      abs(col("rec") - col("target")) * 8192 > col("target")).collect()
    assert(bad.isEmpty, bad.map(_.toString).mkString("\n"))
  }

  test("q136 boundary formula: conditional-min over cum counts equals sort-position selection") {
    // boundary d = min value whose cumulative count >= ceil(d*n/10) must
    // equal the element at 1-based position ceil(d*n/10) of the fully
    // sorted multiset — for arbitrary multisets incl. heavy duplicates.
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 20) {
      val n = 1 + rnd.nextInt(400)
      val vals = Seq.fill(n)(rnd.nextInt(1 + rnd.nextInt(50)).toLong)
      val sorted = vals.sorted
      val counts = scala.collection.SortedMap.from(
        vals.groupBy(identity).view.mapValues(_.size.toLong))
      val cum = counts.toSeq.scanLeft((0L, 0L)) { case ((_, c), (v, k)) => (v, c + k) }.drop(1)
      for (d <- 1 to 9) {
        val target = (d * n.toLong + 9) / 10
        val viaFormula = cum.find(_._2 >= target).map(_._1)
        val viaSort = Some(sorted((target - 1).toInt))
        assert(viaFormula === viaSort, s"trial $trial d=$d n=$n")
      }
    }
  }

  test("scala UDF surface: registered UDF matches the builtin formulation") {
    // SURVEY §2.11 UDF row: the engine prefers builtins, but the register
    // path must work for user extension points.
    import spark.implicits._
    spark.udf.register("graft_tokens_count",
      (text: String) => text.toLowerCase.split("[^a-z0-9]+").count(_.nonEmpty))
    val df = Tables.documents(spark, sf()).limit(50)
    df.createOrReplaceTempView("graft_udf_docs")
    val viaUdf = spark.sql(
      "SELECT doc_id, graft_tokens_count(text) AS n FROM graft_udf_docs ORDER BY doc_id")
      .as[(Long, Int)].collect()
    val viaBuiltin = df
      .select(col("doc_id"), size(ops.Text.tokens(col("text"))).as("n"))
      .orderBy(col("doc_id")).as[(Long, Int)].collect()
    assert(viaUdf.sameElements(viaBuiltin))
  }
}
