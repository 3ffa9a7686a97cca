package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (SURVEY.md §2.11 —
  * mandated LLM-pipeline extension): brute-force cosine top-k as the
  * correctness baseline, IVF (inverted-file) top-k as the scale path, and
  * hyperplane-LSH bucketed near-duplicate pairs.
  *
  * Bit-exact float parity with the DuckDB oracle: every dot product is a
  * sequential left fold — Spark `aggregate(zip_with(a,b,_*_), 0.0, _+_)`
  * mirrors DuckDB `list_reduce(list_transform(...), (acc,x) -> acc+x)`
  * (the 0.0 seed is exact, so both engines add terms in identical order and
  * produce identical doubles; division/sqrt are correctly-rounded IEEE).
  * Everything is codegen'd higher-order functions — no UDFs.
  *
  * Scale stance (100 TB): brute force is O(Q·N) with the query set
  * broadcast — correct but linear; IVF prunes to nprobe/k of the corpus via
  * an equi-join on centroid id (shuffle by cluster, classic IVF layout);
  * hyperplane LSH reduces all-pairs near-dup to band-bucket equi-joins,
  * exactly like the MinHash pipeline in [[Dedup]].
  */
object Vector {

  /** float[] → double[] (per-element cast is correctly rounded, identical in
    * both engines). */
  private def v(c: Column): Column = transform(c, x => x.cast("double"))
  private def vSql(c: String): String = s"list_transform($c, x -> CAST(x AS DOUBLE))"

  /** Sequential left-fold dot product (see class doc for parity argument). */
  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i]), (acc, x) -> acc + x)"

  private def norm(a: Column): Column = sqrt(dot(a, a))
  private def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Brute-force cosine top-k: the ~1% of vectors with `vec_id % 100 = 0`
    * are the query set (broadcast); each scans the full corpus once
    * (BroadcastNestedLoopJoin) and keeps its 10 nearest by cosine. */
  def q50CosineTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), v(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    broadcast(q).join(emb, col("query_id") =!= col("vec_id"))
      .withColumn("cos_sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  val q50Oracle: String =
    s"""WITH e AS (SELECT vec_id, ${vSql("embedding")} AS v FROM embeddings),
      |n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT query_id, vec_id, ${dotSql("qv", "v")} / (qn * nrm) AS cos_sim
      |  FROM q JOIN n ON query_id <> vec_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, vec_id, cos_sim FROM ranked
      |WHERE rk <= 10
      |ORDER BY query_id, rk""".stripMargin

  /** IVF top-k: k=8 "centroids" are the vectors with vec_id < 8
    * (deterministic training stand-in); every vector is assigned to its
    * nearest centroid (one broadcast join + rank); a query probes its
    * nprobe=2 nearest centroids and ranks only vectors assigned there —
    * the candidate set shrinks to ~nprobe/k of the corpus and the probe is
    * an equi-join on centroid id, which is what makes IVF the 100 TB path.
    * Self-matches are excluded. */
  def q51IvfTopk(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), v(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val cent = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("v").as("cv"), col("nrm").as("cn"))
    val simToCent = broadcast(cent).join(emb, lit(true))
      .withColumn("csim", dot(col("cv"), col("v")) / (col("cn") * col("nrm")))
    val wAssign = Window.partitionBy(col("vec_id")).orderBy(col("csim").desc, col("cid").asc)
    val assign = simToCent
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") === 1)
      .select(col("vec_id"), col("cid"))
    val probes = simToCent
      .filter(col("vec_id") % 100 === 0)
      .withColumn("prn", row_number().over(wAssign))
      .filter(col("prn") <= 2)
      .select(col("vec_id").as("query_id"), col("cid"))
    val vecsByCluster = assign
      .join(emb, Seq("vec_id"))
      .select(col("cid"), col("vec_id"), col("v"), col("nrm"))
    val q = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("nrm").as("qn"))
    val wTop = Window.partitionBy(col("query_id")).orderBy(col("cos_sim").desc, col("vec_id").asc)
    probes
      .join(vecsByCluster, Seq("cid"))
      .filter(col("query_id") =!= col("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .withColumn("cos_sim", dot(col("qv"), col("v")) / (col("qn") * col("nrm")))
      .withColumn("rk", row_number().over(wTop).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("query_id"), col("rk"), col("vec_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rk"))
  }

  val q51Oracle: String =
    s"""WITH e AS (SELECT vec_id, ${vSql("embedding")} AS v FROM embeddings),
      |n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
      |cent AS (SELECT vec_id AS cid, v AS cv, nrm AS cn FROM n WHERE vec_id < 8),
      |sim AS (
      |  SELECT n.vec_id, cid, ${dotSql("cv", "v")} / (cn * nrm) AS csim
      |  FROM cent CROSS JOIN n),
      |assign AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS arn
      |    FROM sim) t WHERE arn = 1),
      |probes AS (
      |  SELECT vec_id AS query_id, cid FROM (
      |    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY csim DESC, cid ASC) AS prn
      |    FROM sim WHERE vec_id % 100 = 0) t WHERE prn <= 2),
      |vc AS (SELECT cid, n.vec_id, v, nrm FROM assign JOIN n ON assign.vec_id = n.vec_id),
      |q AS (SELECT vec_id AS query_id, v AS qv, nrm AS qn FROM n WHERE vec_id % 100 = 0),
      |scored AS (
      |  SELECT q.query_id, vc.vec_id, ${dotSql("qv", "v")} / (qn * nrm) AS cos_sim
      |  FROM probes JOIN vc ON probes.cid = vc.cid AND probes.query_id <> vc.vec_id
      |  JOIN q ON probes.query_id = q.query_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rk
      |  FROM scored)
      |SELECT query_id, rk, vec_id, cos_sim FROM ranked
      |WHERE rk <= 5
      |ORDER BY query_id, rk""".stripMargin

  private val SimBits = 16
  private val BandBits = 4

  /** Deterministic pseudo-random hyperplane coefficient for (plane b, dim j):
    * integer mix mod 97, scaled to [-0.5, 0.5] — identical in both engines. */
  private def coef(b: Int, j: Column): Column =
    ((lit(b * 73856093L) + j.cast("long") * lit(19349663L)) % 97).cast("double") / lit(96.0) - lit(0.5)
  private def coefSql(b: Int, j: String): String =
    s"CAST(($b * 73856093 + $j * 19349663) % 97 AS DOUBLE) / 96.0 - 0.5"

  /** Sign bit of the projection of `v` onto hyperplane b (strictly-positive
    * convention; identical fold order in both engines). */
  private def planeBit(b: Int, vc: Column): Column = {
    val proj = aggregate(sequence(lit(1), size(vc)), lit(0.0),
      (acc, j) => acc + coef(b, j) * element_at(vc, j))
    when(proj > 0, 1L).otherwise(0L)
  }
  private def planeBitSql(b: Int, vc: String): String = {
    val proj = s"list_reduce(list_transform(range(1, len($vc) + 1), " +
      s"j -> (${coefSql(b, "j")}) * $vc[j]), (acc, x) -> acc + x)"
    s"CASE WHEN $proj > 0 THEN 1 ELSE 0 END"
  }

  /** Hyperplane-LSH near-duplicate pairs: 16 sign bits → 4 bands of 4 bits →
    * self-join on (band_idx, band_val) → exact cosine on candidates → keep
    * cos ≥ 0.45 (tuned to this corpus's top similarity ≈0.48; real near-dups
    * at cos ≥ 0.95 collide with probability ≈0.99). */
  def q52EmbeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir).select(col("vec_id"), v(col("embedding")).as("v"))
      .withColumn("nrm", norm(col("v")))
    val bits = (0 until SimBits).foldLeft(emb) { (df, b) =>
      df.withColumn(s"bit$b", planeBit(b, col("v")))
    }
    val nBands = SimBits / BandBits
    val bandCols = (0 until nBands).map { band =>
      val value = (0 until BandBits)
        .map(i => col(s"bit${band * BandBits + i}") * lit(1L << i))
        .reduce(_ + _)
      struct(lit(band).as("band_idx"), value.as("band_val"))
    }
    val bands = bits.select(col("vec_id"), explode(array(bandCols: _*)).as("band"))
      .select(col("vec_id"), col("band.band_idx").as("band_idx"), col("band.band_val").as("band_val"))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") && col("a.band_val") === col("b.band_val") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"))
      .distinct()
    cands
      .join(emb.select(col("vec_id").as("vec_a"), col("v").as("va"), col("nrm").as("na")), Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("v").as("vb"), col("nrm").as("nb")), Seq("vec_b"))
      .withColumn("cos_sim", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .filter(col("cos_sim") >= 0.45)
      .select(col("vec_a"), col("vec_b"), col("cos_sim"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val q52Oracle: String = {
    val nBands = SimBits / BandBits
    val bitCols = (0 until SimBits).map(b => s"  ${planeBitSql(b, "v")} AS bit$b").mkString(",\n")
    val bandSelects = (0 until nBands).map { band =>
      val value = (0 until BandBits)
        .map(i => s"bit${band * BandBits + i} * ${1L << i}")
        .mkString(" + ")
      s"SELECT vec_id, $band AS band_idx, $value AS band_val FROM bits"
    }.mkString("\n  UNION ALL ")
    s"""WITH e AS (SELECT vec_id, ${vSql("embedding")} AS v FROM embeddings),
      |n AS (SELECT vec_id, v, ${normSql("v")} AS nrm FROM e),
      |bits AS (
      |  SELECT vec_id,
      |$bitCols
      |  FROM n),
      |bands AS (
      |  $bandSelects),
      |cands AS (
      |  SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
      |  FROM bands a JOIN bands b
      |    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.vec_id < b.vec_id),
      |scored AS (
      |  SELECT vec_a, vec_b, ${dotSql("x.v", "y.v")} / (x.nrm * y.nrm) AS cos_sim
      |  FROM cands JOIN n x ON vec_a = x.vec_id JOIN n y ON vec_b = y.vec_id)
      |SELECT vec_a, vec_b, cos_sim FROM scored
      |WHERE cos_sim >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_cosine_topk"        -> (q50CosineTopk _),
    "q51_ivf_topk"           -> (q51IvfTopk _),
    "q52_embedding_near_dup" -> (q52EmbeddingNearDup _),
  )

  val oracles: Map[String, String] = Map(
    "q50_cosine_topk"        -> q50Oracle,
    "q51_ivf_topk"           -> q51Oracle,
    "q52_embedding_near_dup" -> q52Oracle,
  )
}
