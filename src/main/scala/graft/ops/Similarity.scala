package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Similarity search over the `embeddings` table (builder brief): exact
  * brute-force cosine top-k as the baseline, and an LSH-bucketed
  * (random-hyperplane SimHash) variant as the scale path.
  *
  * Scale design (100 TB): brute force is a query-side broadcast against a
  * full scan — linear per query vector, the right baseline but O(Q·N).
  * The LSH variant buckets both sides by a 4-bit hyperplane signature so
  * the candidate join is an equality join on `bucket` (shuffle-partitioned,
  * no cross product); recall is tunable by planes/probes. Cosine folds are
  * sequential left-to-right over doubles → bit-identical in DuckDB.
  *
  * Tie-breaking: ranking uses the 6-decimal-rounded cosine with vec_id as
  * tiebreaker, so rank order is stable across engines even at FP edges.
  */
object Similarity {

  /** Brute-force exact cosine top-10 for query vectors vec_id < 5. */
  def ssCosineTopk(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings").createOrReplaceTempView("__emb")
    s.sql(
      """WITH base AS (
        |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM __emb),
        |norms AS (
        |  SELECT vec_id, v,
        |         sqrt(graft_dot(v, v)) AS nrm
        |  FROM base),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ROUND(graft_dot(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
        |  FROM (SELECT * FROM norms WHERE vec_id < 5) q
        |  JOIN norms c ON c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos, rn FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |                ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
        |  FROM scored)
        |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin)
  }

  /** The ±1 hyperplane coefficient matrix (4 planes × 64 dims), derived
    * from md5 parity — computed ONCE on the driver and shipped as a
    * literal, instead of re-evaluating 256 md5 calls per row (the DuckDB
    * oracle recomputes the same family inline; values are identical).
    */
  private[ops] def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val digest = java.security.MessageDigest.getInstance("MD5")
    def coef(j: Int, i: Int): Double = {
      val hex = digest.digest(s"$j:$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      val nibble = "0123456789abcdef".indexOf(hex.charAt(0))
      if (nibble % 2 == 0) 1.0 else -1.0
    }
    (0 until nPlanes).map(j => (1 to dim).map(i => coef(j, i)))
  }

  /** The plane matrix as a SQL array-of-arrays literal (shared by the LSH
    * ANN query and Dedup's bucket-blocked embedding near-dup).
    */
  private[ops] def planesSql(nPlanes: Int, dim: Int): String =
    planes(nPlanes, dim)
      .map(p => s"array(${p.map(c => s"${c}D").mkString(",")})")
      .mkString("array(", ",", ")")

  /** LSH-bucketed approximate NN: 4 md5-derived random hyperplanes (±1
    * coefficients) → 16 buckets; exact cosine top-5 among bucket-mates of
    * each query vector vec_id < 20. Bucketing is a narrow map; the only
    * shuffle is the equality join on `bucket`.
    */
  def ssLshAnn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings").createOrReplaceTempView("__emb")
    val planesLit = planesSql(4, 64)
    s.sql(
      s"""WITH base AS (
        |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM __emb),
        |sig AS (
        |  SELECT vec_id, v,
        |         sqrt(graft_dot(v, v)) AS nrm,
        |         aggregate(transform(sequence(0, 3), j ->
        |           CASE WHEN graft_dot(v, element_at($planesLit, j + 1)) > 0D
        |                THEN shiftleft(1, j) ELSE 0 END),
        |           0, (acc, x) -> acc + x) AS bucket
        |  FROM base),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ROUND(graft_dot(q.v, c.v) / (q.nrm * c.nrm), 6) AS cos
        |  FROM (SELECT * FROM sig WHERE vec_id < 20) q JOIN sig c
        |    ON q.bucket = c.bucket AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos, rn FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY query_id
        |                ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin)
  }

  /** IVF-style approximate NN: a coarse quantizer (centroids = the first
    * 16 vectors — a deterministic stand-in for k-means, which a real
    * deployment would train) assigns every vector to its best cluster via
    * a broadcast N×16 scoring; queries (vec_id 20..24) probe their 2
    * nearest clusters and run exact cosine only inside them. Scale story:
    * the centroid table broadcasts, assignment is a narrow pass, and the
    * probe join touches |probed clusters| of the corpus instead of all of
    * it — the classic IVF recall/cost dial (nprobe).
    */
  def ssIvfAnn(s: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    Tables.load(s, dir, "embeddings").createOrReplaceTempView("__emb")
    s.sql(
      """WITH norms AS (
        |  SELECT vec_id, transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM __emb),
        |n2 AS (
        |  SELECT vec_id, v, sqrt(graft_dot(v, v)) AS nrm FROM norms),
        |cent AS (
        |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n2 WHERE vec_id < 16),
        |scoredc AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.cid,
        |         ROUND(graft_dot(n.v, c.cv) / (n.nrm * c.cnrm), 6) AS cs
        |  FROM n2 n CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, v, nrm, cid FROM (
        |    SELECT vec_id, v, nrm, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM scoredc) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS qid, cid FROM (
        |    SELECT vec_id, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM scoredc WHERE vec_id BETWEEN 20 AND 24) WHERE rn <= 2),
        |qv AS (
        |  SELECT vec_id AS qid, v AS qvec, nrm AS qnrm FROM n2
        |  WHERE vec_id BETWEEN 20 AND 24),
        |scored AS (
        |  SELECT p.qid, a.vec_id AS neighbor_id,
        |         ROUND(graft_dot(q.qvec, a.v) / (q.qnrm * a.nrm), 6) AS cos
        |  FROM probes p
        |  JOIN assign a ON a.cid = p.cid
        |  JOIN qv q ON q.qid = p.qid
        |  WHERE a.vec_id <> p.qid)
        |SELECT qid AS query_id, neighbor_id, cos, rn FROM (
        |  SELECT qid, neighbor_id, cos,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |                ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_cosine_topk" -> (ssCosineTopk _),
    "ss_lsh_ann" -> (ssLshAnn _),
    "ss_ivf_ann" -> (ssIvfAnn _))

  val oracleSql: Map[String, String] = Map(
    "ss_cosine_topk" ->
      """WITH base AS (
        |  SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
        |norms AS (
        |  SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM base),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ROUND(list_sum([q.v[i] * c.v[i]
        |                 FOR i IN generate_series(1, len(q.v))])
        |               / (q.nrm * c.nrm), 6) AS cos
        |  FROM norms q JOIN norms c ON q.vec_id < 5 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos, rn FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM scored)
        |WHERE rn <= 10 ORDER BY query_id, rn""".stripMargin.replaceAll("\n", " "),
    "ss_lsh_ann" ->
      """WITH base AS (
        |  SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
        |sig AS (
        |  SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm,
        |         list_sum([CASE WHEN list_sum([v[i] *
        |             (CASE WHEN (strpos('0123456789abcdef',
        |                    substr(md5(j::VARCHAR || ':' || i::VARCHAR), 1, 1)) - 1)
        |                   % 2 = 0
        |                   THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)
        |             FOR i IN generate_series(1, len(v))]) > 0
        |           THEN 1 << j ELSE 0 END
        |           FOR j IN generate_series(0, 3)])::INT AS bucket
        |  FROM base),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         ROUND(list_sum([q.v[i] * c.v[i]
        |                 FOR i IN generate_series(1, len(q.v))])
        |               / (q.nrm * c.nrm), 6) AS cos
        |  FROM sig q JOIN sig c
        |    ON q.bucket = c.bucket AND q.vec_id < 20 AND c.vec_id <> q.vec_id)
        |SELECT query_id, neighbor_id, cos, rn FROM (
        |  SELECT query_id, neighbor_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |           ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin.replaceAll("\n", " "),
    "ss_ivf_ann" ->
      """WITH norms AS (
        |  SELECT vec_id, [x::DOUBLE FOR x IN embedding] AS v FROM embeddings),
        |n2 AS (
        |  SELECT vec_id, v, sqrt(list_sum([x * x FOR x IN v])) AS nrm FROM norms),
        |cent AS (
        |  SELECT vec_id AS cid, v AS cv, nrm AS cnrm FROM n2 WHERE vec_id < 16),
        |scoredc AS (
        |  SELECT n.vec_id, n.v, n.nrm, c.cid,
        |         ROUND(list_sum([n.v[i] * c.cv[i]
        |                 FOR i IN generate_series(1, len(n.v))])
        |               / (n.nrm * c.cnrm), 6) AS cs
        |  FROM n2 n CROSS JOIN cent c),
        |assign AS (
        |  SELECT vec_id, v, nrm, cid FROM (
        |    SELECT vec_id, v, nrm, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM scoredc) WHERE rn = 1),
        |probes AS (
        |  SELECT vec_id AS qid, cid FROM (
        |    SELECT vec_id, cid,
        |           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        |    FROM scoredc WHERE vec_id BETWEEN 20 AND 24) WHERE rn <= 2),
        |qv AS (
        |  SELECT vec_id AS qid, v AS qvec, nrm AS qnrm FROM n2
        |  WHERE vec_id BETWEEN 20 AND 24),
        |scored AS (
        |  SELECT p.qid, a.vec_id AS neighbor_id,
        |         ROUND(list_sum([q.qvec[i] * a.v[i]
        |                 FOR i IN generate_series(1, len(q.qvec))])
        |               / (q.qnrm * a.nrm), 6) AS cos
        |  FROM probes p
        |  JOIN assign a ON a.cid = p.cid
        |  JOIN qv q ON q.qid = p.qid
        |  WHERE a.vec_id <> p.qid)
        |SELECT qid AS query_id, neighbor_id, cos, rn FROM (
        |  SELECT qid, neighbor_id, cos,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |           ORDER BY cos DESC, neighbor_id) AS rn
        |  FROM scored)
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin.replaceAll("\n", " "))
}
