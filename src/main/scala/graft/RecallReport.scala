package graft

import graft.core.Tables
import graft.functions.{TopKAgg, VectorF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-round quality artifact for the APPROXIMATE operators — the
  * entries the DuckDB oracle can't check (`no_oracle` in
  * CORRECTNESS_r*.json report row counts only, so a recall regression
  * would otherwise be invisible to the driver). Persists
  * `target/recall_full.json` with:
  *
  *  - recall@10 vs the exact L2 path for the eight ANN index entries
  *    (`q_ann_ivf/gann/pq/ivfpq/bq/ivfbq/sq/ivfsq` — search quality is the
  *    reference's core value proposition, gann.py:234-239);
  *  - pair recall vs an exact-subset verify for `q_ann_lsh_join`;
  *  - max relative error of the HLL sketch (`q_events_approx_users`)
  *    vs exact COUNT(DISTINCT);
  *  - FastRP and BPE equivalence booleans (distributed == independent
  *    sequential reference, the same properties FastRPSpec /
  *    BpeTrainSpec pin — re-asserted here so the artifact is
  *    self-contained per round).
  *
  * Invoked by [[Bench]] after the timed passes (models are memoized, so
  * the ANN re-searches are steady-state) and standalone via [[Recall]].
  */
object RecallReport {

  /** exact top-K neighbour id-sets per query for the ANN entries' batch
    * (vec_id < 100, self excluded) — one broadcast-queries scan through
    * the bounded-heap TopKAgg, the same shape as q_knn_brute.
    * `candFilter` restricts the CANDIDATE side only (the filtered-search
    * baseline: queries stay the full batch, neighbours must satisfy the
    * filter — the exact twin of `IvfIndex.Model.search(allowedIds)`). */
  private[graft] def exactTopK(spark: SparkSession, sfDir: String,
      k: Int,
      candFilter: Option[org.apache.spark.sql.Column] = None)
      : Map[Long, Set[Long]] = {
    val e0 = Tables.spread(Tables(spark, sfDir, "embeddings"))
    val queries = e0.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("embedding").as("qv"))
    val e = candFilter.fold(e0)(e0.filter)
    e.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        VectorF.l2Dist(col("embedding"), col("qv")).as("dist"))
      .groupBy(col("qid"))
      .agg(TopKAgg.topK(col("dist"), col("vec_id"), k).as("top"))
      .select(col("qid"), explode(col("top")).as("s"))
      .select(col("qid"), col("s.id"))
      .collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  private def recallOf(spark: SparkSession, sfDir: String,
      exact: Map[Long, Set[Long]], name: String): Double =
    recallOfDf(SparkEntry.queries(name)(spark, sfDir), exact)

  /** Mean per-query recall of a (qid, vec_id) result frame against the
    * exact neighbour sets — shared with the [[RecallCurve]] sweep. */
  private[graft] def recallOfDf(df: DataFrame,
      exact: Map[Long, Set[Long]]): Double = {
    val got = df.select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val per = exact.map { case (q, want) =>
      got.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }
    if (per.isEmpty) 0.0 else per.sum / per.size
  }

  /** Pair recall of the LSH join vs the exact pair set computed over a
    * bounded hash-spread subset (the full exact pair set is O(n²) — at
    * bench SF only a subset verify is affordable, and recall on a
    * uniform subset estimates recall on the population). */
  private def lshPairRecall(spark: SparkSession, sfDir: String): Double = {
    val e = Tables.spread(Tables(spark, sfDir, "embeddings"))
    val sub = e.orderBy(xxhash64(col("vec_id").cast("string")), col("vec_id"))
      .limit(1500).select(col("vec_id"), col("embedding")).cache()
    try {
      val ids = sub.select("vec_id").collect().map(_.getLong(0)).toSet
      val a = sub.select(col("vec_id").as("ida"), col("embedding").as("va"))
      val b = sub.select(col("vec_id").as("idb"), col("embedding").as("vb"))
      val exactPairs = a.crossJoin(broadcast(b))
        .filter(col("ida") < col("idb"))
        .filter(VectorF.l2Dist(col("va"), col("vb")) < lit(1.2))
        .select("ida", "idb").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      if (exactPairs.isEmpty) 1.0
      else {
        val lsh = SparkEntry.queries("q_ann_lsh_join")(spark, sfDir)
          .select("ida", "idb").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
          .filter { case (x, y) => ids(x) && ids(y) }.toSet
        lsh.intersect(exactPairs).size.toDouble / exactPairs.size
      }
    } finally { sub.unpersist(blocking = false); () }
  }

  /** Max relative error of approx_count_distinct vs the exact distinct
    * count, over the event types. (Computed from the raw sketch
    * directly — the q_events_approx_users entry itself now emits the
    * exact twin + in-bound boolean for the driver's hash gate, round
    * 17, so the raw estimate no longer appears in its output.) */
  private def hllMaxRelErr(spark: SparkSession, sfDir: String): Double = {
    val approx = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables(spark, sfDir, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.map { case (t, ex) =>
      math.abs(approx.getOrElse(t, 0L) - ex).toDouble / math.max(ex, 1L)
    }.max
  }

  /** Max relative error of the approx_percentile sketch entry vs the
    * exact-percentile entry, over every (group, percentile) cell. The
    * exact path interpolates while the sketch returns data values, so
    * the metric absorbs rank slack AND interpolation — the honest
    * user-visible error. */
  private def quantileMaxRelErr(spark: SparkSession, sfDir: String): Double = {
    val exact = SparkEntry.queries("q_quantiles")(spark, sfDir)
      .select("l_returnflag", "p50", "p90", "p99").collect()
      .map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    // raw sketch, computed directly: the q_quantiles_sketch entry now
    // emits exact values + in-bound booleans for the driver's hash gate
    // (round 17), so the raw estimates no longer appear in its output
    val approx = Tables(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(expr(
        "approx_percentile(l_quantity, array(0.5, 0.9, 0.99), 10000)")
        .as("q"))
      .collect()
      .map(r => r.getString(0) ->
        r.getSeq[Double](1).toSeq).toMap
    // fail loudly, not synthetically (round-15 advice): a group missing
    // from either side — or an empty result — is a real defect in the
    // sketch entry, and must surface AS that defect rather than as a
    // coerced "rel err ~1.0" cell or an opaque empty-max throw
    require(exact.nonEmpty, "quantile gate: exact entry returned no groups")
    require(exact.keySet == approx.keySet,
      s"quantile gate: group keysets differ — exact ${exact.keys.toSeq.sorted
        .mkString("[", ",", "]")} vs sketch ${approx.keys.toSeq.sorted
        .mkString("[", ",", "]")}")
    exact.map { case (g, ex) =>
      ex.zip(approx(g)).map { case (e, a) =>
        math.abs(a - e) / math.max(math.abs(e), 1e-9)
      }.max
    }.max
  }

  // ---- equivalence booleans (fixed small inputs, SF-independent) ----

  /** Independent sequential BPE (the BpeTrainSpec reference): merge the
    * globally most frequent adjacent pair, ties lexicographic. */
  private def naiveBpe(words: Seq[String], numMerges: Int): Seq[(String, String)] = {
    var state: Map[Seq[String], Long] =
      words.groupBy(identity).map { case (w, g) =>
        (w.map(_.toString): Seq[String]) -> g.size.toLong
      }
    var merges = Vector.empty[(String, String)]
    var round = 0
    while (round < numMerges) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      state.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + n
        }
      }
      if (counts.isEmpty) return merges
      val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a + " " + b) }._1
      merges = merges :+ best
      state = state.groupMapReduce { case (syms, _) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == best._1 && syms(i + 1) == best._2) {
            out += best._1 + best._2; i += 2
          } else { out += syms(i); i += 1 }
        }
        out.toSeq: Seq[String]
      }(_._2)(_ + _)
      round += 1
    }
    merges
  }

  private def bpeMatches(spark: SparkSession): Boolean = {
    import spark.implicits._
    val words = Seq.fill(10)("hug") ++ Seq.fill(5)("pug") ++
      Seq.fill(12)("pun") ++ Seq.fill(4)("bun") ++ Seq.fill(5)("hugs")
    val got = graft.vectorize.BpeTrain.learn(
      graft.vectorize.BpeTrain.vocab(words.toDF("text"), "text"), numMerges = 6)
    got == naiveBpe(words, numMerges = 6)
  }

  /** Distributed FastRP vs the dense closed form on a fixed 5-node
    * graph (the FastRPSpec oracle, compacted) — with the SAME
    * integer-micros quantization as the engine (round 10), so the
    * comparison is exact equality instead of a float tolerance. */
  private def fastRpMatches(spark: SparkSession): Boolean = {
    def rnd0(x: Double): Double =
      BigDecimal(java.math.BigDecimal.valueOf(x))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toDouble
    import spark.implicits._
    val dim = 4; val seed = 42L; val weights = Seq(0.1, 0.2, 1.0, 3.0)
    val edges = Seq((0L, 1L, 1.0), (1L, 2L, 1.0), (2L, 0L, 1.0),
      (0L, 2L, 2.0), (3L, 0L, 1.0), (2L, 3L, 0.5), (4L, 2L, 1.0))
    def h32(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val idx = nodes.zipWithIndex.toMap
    val a = Array.fill(n, n)(0.0)
    edges.foreach { case (s, d, w) => a(idx(s))(idx(d)) += w }
    val density = 1.0 / math.sqrt(dim)
    val scale = math.sqrt(1.0 / density) / math.sqrt(dim)
    def rRow(node: Long): Array[Double] =
      (0 until dim).map { k =>
        val u = (h32(s"rp$seed#$node#$k") % 1000000L).toDouble / 1000000.0
        if (u < density / 2) scale else if (u < density) -scale else 0.0
      }.toArray
    val lr = nodes.map(nd => rRow(nd).map(v => rnd0(v * (0.5 / n) * 1e6)))
    def matmul(x: Seq[Array[Double]]): Seq[Array[Double]] =
      nodes.indices.map { i =>
        val out = new Array[Double](dim)
        nodes.indices.foreach { j =>
          if (a(i)(j) != 0.0)
            (0 until dim).foreach(k => out(k) += rnd0(x(j)(k) * a(i)(j)))
        }
        out
      }
    var nk = matmul(lr)
    val want = nk.map(_.map(v => rnd0(v * weights.head))).toArray
    weights.tail.foreach { w =>
      nk = matmul(nk)
      nodes.indices.foreach(i =>
        (0 until dim).foreach(k => want(i)(k) += rnd0(nk(i)(k) * w)))
    }
    val got = graft.vectorize.FastRP.embed(
        edges.toDF("src", "dst", "weight"), dim, weights, beta = 0.0, seed = seed)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    nodes.indices.forall { i =>
      got.get(nodes(i)).exists { g =>
        (0 until dim).forall(k => g(k) == want(i)(k) / 1e6)
      }
    }
  }

  /** Quantizer-drift monitor over the maintained IVF serving union
    * (round 17 — the r16 verdict's missing failure-mode owner): mean
    * distance to assigned centroid, streamed vs resident
    * ([[graft.index.IvfIndex.servingDrift]] on the same persisted index
    * the q_stream_index_insert_ivf entries serve). On the UNdrifted
    * bench corpus the streamed quarter comes from the same distribution
    * as the resident fit, so the ratio sits near 1 (measured 1.02 at
    * sf0.1); the ceiling is the gate that fires when sustained ingest
    * drifts the encode quality before recall visibly decays — the
    * measured drift→recall curve and the `refit_compact` recovery are
    * in SCALE.md's ivf_drift row. */
  private def ivfServingDriftRatio(spark: SparkSession, sfDir: String): Double = {
    val path = graft.queries.StreamingQ.maintainedIvfIndexPath(spark, sfDir)
    val (resident, streamed) =
      graft.index.IvfIndex.servingDrift(spark, path, "embedding")
    if (resident.isNaN || streamed.isNaN || resident <= 0) Double.NaN
    else streamed / resident
  }

  private def fmt(v: Double): String =
    "%.4f".formatLocal(java.util.Locale.ROOT, v)

  /** Per-entry quality FLOORS — the gate that makes a recall regression
    * fail loudly instead of shipping a green round (the oracle can't see
    * approximate-entry quality; without floors a refactor dropping GANN
    * recall 0.75 → 0.40 would still pass every artifact). Values sit
    * ~0.04-0.10 under the measured sf0.1 steady state (recall is
    * deterministic per SF — hash-seeded fits, no RNG — so any breach is
    * a code change, not noise). The BQ-family floors reflect the tuned
    * 40×k shortlist defaults (see the RecallCurve sweep in SCALE.md).
    *
    * Round 11 ratchet: floors raised to measured−0.02 so a 4-9 point
    * silent regression can no longer pass the old 0.8 line. Determinism
    * makes the tight margin safe: any breach is a code change.
    *
    * Round 12 ratchet (the recall-headroom round): the IVF/PQ family's
    * serving knobs went up one rung each — ivf/ivfsq nprobe 5→6, ivfpq
    * nprobe 6→7 + shortlist 100→200, pq shortlist 100→200 — lifting the
    * measured sf0.1 steady state to ivf 0.926, ivfsq 0.926, pq 0.942,
    * ivfpq 0.941 at FLAT entry times (each re-timed at or below its
    * r11 level; the deeper shortlists ride the same broadcast-rerank
    * join). Floors follow at measured−0.02. gann 0.891, bq 0.898,
    * sq 1.000, lsh 0.990, hll err 0.0047 are unchanged.
    *
    * Round 13 ratchet: ivfbq — the tier r12 left at 0.856 — moves
    * nprobe 6→7 + shortlist 400→800 (the same rerank-widening knob),
    * measured 0.952 at sf0.1; floor 0.83 → 0.93 = measured−0.02. Flat
    * bq follows the same rung (shortlist 400→800: the Hamming pass
    * reads 100% of codes at any shortlist, only the k-bounded rerank
    * deepens), measured 0.980; floor 0.87 → 0.96.
    *
    * Round 14 ratchet: gann — the family's last sub-0.9 tier — adds a
    * 4th tree (tree diversity, not beam width: beam=2 on 3 trees
    * measured only 0.896 where the 4th tree reaches 0.943 at sf0.1,
    * 1.1 s warm); floor 0.87 → 0.92 = measured−0.02. */
  private[graft] val recallFloors: Map[String, Double] = Map(
    "q_ann_ivf" -> 0.90, "q_ann_gann" -> 0.92, "q_ann_pq" -> 0.92,
    "q_ann_ivfpq" -> 0.92, "q_ann_bq" -> 0.96, "q_ann_ivfbq" -> 0.93,
    "q_ann_sq" -> 0.98, "q_ann_ivfsq" -> 0.90,
    // stream-maintained GANN (base 3/4 build + 1/4 streamed block
    // appends through the frozen forest): tracks q_ann_gann's level —
    // routing is build-identical, so streamed rows rank like resident
    // ones (measured 0.908 at sf0.1; floor = measured−0.02)
    "q_stream_index_insert" -> 0.88,
    // filtered IVF search (round 12): same index/model/nprobe as
    // q_ann_ivf, allowed set = label < 3 semi-joined pre-distance;
    // scored vs the exact FILTERED brute force — measured 0.913 at
    // sf0.1, floor = measured−0.02
    "q_ann_ivf_filtered" -> 0.89,
    // filtered search on the compressed tier (round 14): the allowed
    // set semi-joins the IVF-BQ code table before the Hamming fold,
    // same nprobe-7/shortlist-800 knobs as q_ann_ivfbq; scored vs the
    // exact FILTERED brute force — measured 0.964 at sf0.1
    // (selectivity HELPS the compressed tier: the semi-join thins each
    // probed cluster, so the fixed shortlist covers more of the allowed
    // set); floor = measured−0.02
    "q_ann_ivfbq_filtered" -> 0.94,
    // round 15 — the remaining filtered tiers gated (flat BQ/PQ/SQ):
    // same allowed semi-join before the code-distance fold, same
    // shortlist knobs as the unfiltered twins; the ~30% selectivity
    // widens effective shortlist coverage of the allowed set, so each
    // measures at or above its unfiltered sibling at sf0.1; floors =
    // measured-0.02 (capped at 0.98 where measured = 1.0)
    "q_ann_bq_filtered" -> 0.98,
    "q_ann_pq_filtered" -> 0.97,
    "q_ann_sq_filtered" -> 0.98,
    // round 16 — filtered search over the STREAM-MAINTAINED serving
    // union (base 3/4 ∪ streamed 1/4 blocks through the frozen forest):
    // allowed set label < 3 semi-joined pre-distance across both block
    // families, scored vs the exact filtered brute force over the same
    // union. Measured 0.905 at sf0.1, tracking the unfiltered twin's
    // 0.908 rather than exceeding it the way the compressed filtered
    // tiers do — a GANN probe visits a FIXED leaf set (no
    // shortlist-depth knob for selectivity to stretch), so the filter
    // thins candidates within the same leaves; floor = measured−0.02,
    // same rung as the unfiltered serving floor
    "q_stream_index_insert_filtered" -> 0.88,
    // round 16 — the IVF serving-union twins (base 3/4 quantizer fit,
    // streamed 1/4 encoded by the frozen centroids, nprobe 6 of 8 like
    // q_ann_ivf): measured 0.924 plain / 0.884 filtered at sf0.1 —
    // plain within noise of the static q_ann_ivf's 0.926 (frozen encode
    // ranks streamed rows exactly like resident ones); the filtered
    // union sits ~3 points under the static filtered tier's 0.913
    // because the quantizer saw only the resident 3/4, so the allowed
    // set's streamed members land in slightly worse-fitting clusters;
    // floors = measured−0.02
    "q_stream_index_insert_ivf" -> 0.90,
    "q_stream_index_insert_ivf_filtered" -> 0.86)
  private[graft] val lshPairRecallFloor: Double = 0.97
  private[graft] val hllMaxRelErrCeil: Double = 0.01
  // streamed/resident mean-centroid-distance ratio for the maintained
  // IVF serving union: 1.01 measured on the undrifted corpus (drift
  // fixture d=0, same-distribution ingest). SCALE.md's measured curve:
  // at the entries' nprobe-6 serving knob recall stays FLAT
  // (0.915-0.921) even at ratio 1.57, while the tight nprobe-2 regime
  // starts bleeding near ratio ~1.2 (0.473 → 0.436) — so 1.15 is the
  // "investigate / schedule refit_compact" line: past the undrifted
  // band, at the knee where tight-probe quality starts moving, well
  // before the serving knob ever does
  private[graft] val ivfDriftRatioCeil: Double = 1.15
  // GK accuracy 10000 → rank error ≤ n/10⁴; on the l_quantity integer
  // domain (1..50) one rank step near a percentile moves the value at
  // most one unit → measured max rel err 0.0 at sf0.1/sf0.01, ceiling
  // set loose enough for any SF's group sizes (round 14)
  private[graft] val quantileMaxRelErrCeil: Double = 0.05

  /** The artifact plus the list of floor breaches (empty = healthy). */
  final case class Report(json: String, failures: Seq[String])

  /** Compute every quality number; the JSON carries the floors and the
    * breach list so the per-round artifact is self-gating. */
  def compute(spark: SparkSession, sfDir: String): Report = {
    val k = 10
    val exact = exactTopK(spark, sfDir, k)
    val annEntries = Seq("q_ann_ivf", "q_ann_gann", "q_ann_pq",
      "q_ann_ivfpq", "q_ann_bq", "q_ann_ivfbq", "q_ann_sq", "q_ann_ivfsq",
      "q_stream_index_insert", "q_stream_index_insert_ivf")
    // filtered search scores against the exact FILTERED brute force —
    // the same allowed set (label < 3) the entry semi-joins
    val exactFiltered = exactTopK(spark, sfDir, k, Some(col("label") < 3))
    val filteredEntries = Seq("q_ann_ivf_filtered", "q_ann_ivfbq_filtered",
      "q_ann_bq_filtered", "q_ann_pq_filtered", "q_ann_sq_filtered",
      "q_stream_index_insert_filtered", "q_stream_index_insert_ivf_filtered")
    val recalls = annEntries.map(nm =>
      nm -> recallOf(spark, sfDir, exact, nm)) ++
      filteredEntries.map(nm =>
        nm -> recallOf(spark, sfDir, exactFiltered, nm))
    val lsh = lshPairRecall(spark, sfDir)
    val hll = hllMaxRelErr(spark, sfDir)
    val qre = quantileMaxRelErr(spark, sfDir)
    val drift = ivfServingDriftRatio(spark, sfDir)
    val fastrp = fastRpMatches(spark)
    val bpe = bpeMatches(spark)
    val failures =
      (if (!drift.isNaN && drift > ivfDriftRatioCeil)
        Seq(s"ivf_serving_drift_ratio ${fmt(drift)} > ceil ${fmt(ivfDriftRatioCeil)}" +
          " — schedule refit_compact")
      else Nil) ++
      recalls.collect { case (nm, r) if r < recallFloors(nm) =>
        s"$nm recall ${fmt(r)} < floor ${fmt(recallFloors(nm))}" } ++
      (if (lsh < lshPairRecallFloor)
        Seq(s"q_ann_lsh_join pair recall ${fmt(lsh)} < floor ${fmt(lshPairRecallFloor)}")
      else Nil) ++
      (if (hll > hllMaxRelErrCeil)
        Seq(s"q_events_approx_users max rel err ${fmt(hll)} > ceil ${fmt(hllMaxRelErrCeil)}")
      else Nil) ++
      (if (qre > quantileMaxRelErrCeil)
        Seq(s"q_quantiles_sketch max rel err ${fmt(qre)} > ceil ${fmt(quantileMaxRelErrCeil)}")
      else Nil) ++
      (if (!fastrp) Seq("fastrp_matches_dense is false") else Nil) ++
      (if (!bpe) Seq("bpe_matches_sequential is false") else Nil)
    val rj = recalls.map { case (nm, r) => "\"" + nm + "\":" + fmt(r) }
      .mkString("{", ",", "}")
    val fj = recallFloors.toSeq.sortBy(_._1)
      .map { case (nm, f) => "\"" + nm + "\":" + fmt(f) }
      .mkString("{", ",",
        s""","lsh_join_pair_recall":${fmt(lshPairRecallFloor)}""" +
        s""","hll_max_rel_err_max":${fmt(hllMaxRelErrCeil)}""" +
        s""","quantile_max_rel_err_max":${fmt(quantileMaxRelErrCeil)}}""")
    def qstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val failJ = failures.map(qstr).mkString("[", ",", "]")
    val sfName = new java.io.File(sfDir).getName
    val json =
      s"""{"recall_at_$k":$rj,"lsh_join_pair_recall":${fmt(lsh)},""" +
      s""""hll_max_rel_err":${fmt(hll)},"quantile_max_rel_err":${fmt(qre)},""" +
      s""""ivf_serving_drift_ratio":${
        if (drift.isNaN) "null" else fmt(drift)},""" +
      s""""ivf_serving_drift_ratio_max":${fmt(ivfDriftRatioCeil)},""" +
      s""""fastrp_matches_dense":$fastrp,""" +
      s""""bpe_matches_sequential":$bpe,"queries":${exact.size},"sf":"$sfName",""" +
      s""""floors":$fj,"floor_failures":$failJ}"""
    Report(json, failures)
  }

  /** Compute and persist `target/recall_full.json`; returns the report
    * (callers gate on `failures` — [[Recall]] exits nonzero, [[Bench]]
    * shouts on stderr). */
  def write(spark: SparkSession, sfDir: String): Report = {
    val rep = compute(spark, sfDir)
    val dir = java.nio.file.Paths.get("target")
    java.nio.file.Files.createDirectories(dir)
    java.nio.file.Files.write(dir.resolve("recall_full.json"),
      (rep.json + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    rep
  }
}

/** Standalone entry point: `runMain graft.Recall [sfDir]` — same
  * session config as Bench, prints the artifact JSON as the last line
  * and EXITS NONZERO on any floor breach (the round gate: a recall
  * regression must fail loudly, not ship inside a green round). */
object Recall {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption
      .getOrElse(sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rep = RecallReport.write(spark, sfDir)
    spark.stop()
    rep.failures.foreach(f => System.err.println(s"[recall] FLOOR BREACH: $f"))
    println(rep.json)
    System.out.flush()
    if (rep.failures.nonEmpty) sys.exit(1)
  }
}
