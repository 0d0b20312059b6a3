package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, TextDedup}
import graft.sources.Tables

/** CI guard for the contract-oracle margins (CLAUDE.md rule: every
  * approximate operator's boolean bound must hold with >= 1 unit of
  * measured margin, so a fixture or tuning change cannot silently land
  * a contract on its boundary — the gate would then flake instead of
  * fail honestly).
  *
  * Runs at sf0.01 in every `sbt test`; set GRAFT_SLOW=1 to sweep sf0.1
  * too (the brute-force truth there takes minutes — graft.RecallProbe
  * prints the same numbers for manual tuning).
  *
  * The asserted bounds are the SparkEntry contracts + 1 unit:
  *  - d02 minhash: oracle asserts recall >= 0.9 of the shingle-Jaccard
  *    truth set → require n_hit >= ceil(0.9 * n_true) + 1
  *  - d05 sign-LSH near-dup: oracle recall >= 0.8 → same construction
  *  - s02 LSH top-10: oracle n_hit >= 6 per query → require min >= 7
  *  - s03 IVF top-10: oracle n_hit >= 4 per query → require min >= 5
  */
class RecallMarginSpec extends SparkSpec {

  private val sfDirs =
    Seq(sf("sf0.01")) ++
      (if (sys.env.contains("GRAFT_SLOW")) Seq(sf("sf0.1")) else Nil)

  for (sfDir <- sfDirs) {
    test(s"pair-recall contracts hold with margin at $sfDir") {
      val docs = Tables.documents(spark, sfDir)
      val emb = Tables.embeddings(spark, sfDir)

      val d02Truth = TextDedup.shingleJaccardPairs(docs, "doc_id", "text")
      val d02True = d02Truth.count()
      val d02Hit = d02Truth.join(
        TextDedup.minhashPairs(docs, "doc_id", "text")
          .select("id_a", "id_b"),
        Seq("id_a", "id_b"), "left_semi").count()
      assert(d02True > 0, "d02 truth set empty — fixture changed?")
      assert(d02Hit >= math.ceil(0.9 * d02True).toLong + 1,
        s"d02 margin gone: $d02Hit hits of $d02True (bound 0.9)")

      val d05Truth = Similarity.bruteForcePairs(emb, 0.4)
      val d05True = d05Truth.count()
      val d05Hit = d05Truth.join(
        Similarity.nearDupPairs(emb, 0.4).select("id_a", "id_b"),
        Seq("id_a", "id_b"), "left_semi").count()
      assert(d05True > 0, "d05 truth set empty — fixture changed?")
      assert(d05Hit >= math.ceil(0.8 * d05True).toLong + 1,
        s"d05 margin gone: $d05Hit hits of $d05True (bound 0.8)")

      // d09 semdedup: drop-recall bound 0.7 vs the ideal drop set
      // (distinct higher ids of the d05 truth pairs), plus the
      // justification theorem (zero drops outside the ideal set)
      val ideal = d05Truth.select(col("id_b").as("vec_id")).distinct()
      val idealN = ideal.count()
      val dropped = Similarity.semDedup(emb, 0.4)
        .filter(col("dropped")).select("vec_id")
      val d09Hit = ideal.join(dropped, Seq("vec_id"), "left_semi").count()
      val d09Unjust = dropped.join(ideal, Seq("vec_id"), "left_anti").count()
      assert(d09Hit >= math.ceil(0.7 * idealN).toLong + 1,
        s"d09 margin gone: $d09Hit hits of $idealN (bound 0.7)")
      assert(d09Unjust == 0, s"d09: $d09Unjust unjustified drops")
    }

    test(s"ANN per-query hit contracts hold with margin at $sfDir") {
      val emb = Tables.embeddings(spark, sfDir)
      val q = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, q, 10)
        .select(col("query_id"), col("cand_id"))

      def minHits(approx: org.apache.spark.sql.DataFrame): Long = {
        val hits = exact
          .join(approx.select(col("query_id"), col("cand_id")),
            Seq("query_id", "cand_id"), "left_semi")
          .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        (0L until 10L).map(i => hits.getOrElse(i, 0L)).min
      }

      val s02Min = minHits(Similarity.lshTopK(emb, q, 10))
      assert(s02Min >= 7, s"s02 margin gone: min hits $s02Min, contract 6")

      val s03Min = minHits(Similarity.ivfTopK(emb, q, 10, nProbe = 7))
      assert(s03Min >= 5, s"s03 margin gone: min hits $s03Min, contract 4")

      val s10Min = minHits(Similarity.pqTopK(emb, q, 10))
      assert(s10Min >= 6, s"s10 margin gone: min hits $s10Min, contract 5")

      val s16Min = minHits(
        Similarity.ivfAdcTopK(emb, q, 10, m = 16, rerank = 500))
      assert(s16Min >= 5, s"s16 margin gone: min hits $s16Min, contract 4")

      // s19 cross-modal: its truth is the text-query x image-corpus
      // brute force, so it needs its own hit table (text ids +100000)
      val tq = EntryDefsB.crossModalQueries(spark, sfDir)
      val exactX = Similarity.bruteForceTopK(emb, tq, 10)
        .select(col("query_id"), col("cand_id"))
      val s19Hits = exactX
        .join(Similarity.ivfAdcSearch(emb,
            Similarity.buildIvfAdcIndex(emb, m = 16), tq, 10,
            nProbe = 9, rerank = 500)
          .select(col("query_id"), col("cand_id")),
          Seq("query_id", "cand_id"), "left_semi")
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hit"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val s19Min =
        (100000L until 100010L).map(i => s19Hits.getOrElse(i, 0L)).min
      assert(s19Min >= 6, s"s19 margin gone: min hits $s19Min, contract 5")
    }

    test(s"q52 HLL estimates stay under HALF the 5pct allowance at $sfDir") {
      // contract: every per-day estimate and the union-merged total
      // within 5% of exact; require the measured relative error < 2.5%
      // so a Datasketches default change flakes here before the gate
      val days = Tables.events(spark, sfDir)
        .select(to_date(col("ts")).cast("string").as("day"), col("user_id"))
      val rows = days.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"),
          countDistinct(col("user_id")).as("n_exact"))
      val perDayErr = rows
        .select((abs(hll_sketch_estimate(col("sk")) - col("n_exact"))
          .cast("double") / col("n_exact")).as("rel"))
        .agg(max(col("rel"))).collect().head.getDouble(0)
      assert(perDayErr < 0.025,
        f"q52 per-day margin gone: max rel err $perDayErr%.4f vs 0.025")
      val totalEst = rows
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))))
        .collect().head.getLong(0)
      val totalExact = days.select(countDistinct(col("user_id")))
        .collect().head.getLong(0)
      val totErr = math.abs(totalEst - totalExact).toDouble / totalExact
      assert(totErr < 0.025,
        f"q52 total margin gone: rel err $totErr%.4f vs 0.025")
    }

    test(s"s07 JL distortion stays clear of both contract bounds at $sfDir") {
      // contract: mae <= 0.2, frac(|err|<=0.3) >= 0.8; require measured
      // mae <= 0.17 and frac >= 0.85 so a plane-seed or fixture change
      // flakes here before the gate
      val r = Similarity.jlDistortionPairs(Tables.embeddings(spark, sfDir))
        .agg(avg(abs(col("cos_proj") - col("cos_exact"))).as("mae"),
          avg((abs(col("cos_proj") - col("cos_exact")) <= 0.3)
            .cast("int")).as("frac"))
        .collect().head
      assert(r.getDouble(0) <= 0.17,
        f"s07 mae margin gone: ${r.getDouble(0)}%.4f vs 0.17")
      assert(r.getDouble(1) >= 0.85,
        f"s07 frac margin gone: ${r.getDouble(1)}%.4f vs 0.85")
    }

    test(s"q67 CMS overestimates stay under HALF the eps*N allowance at $sfDir") {
      // contract: est - true <= 0.001*N for every 1%-heavy token;
      // require the measured max overestimate under 0.0005*N so a
      // sketch-width or fixture change flakes here before the gate
      val toks = Tables.documents(spark, sfDir)
        .select(explode(EntryDefsB.zipfTokens).as("token"))
      val n = toks.count()
      val sk = toks.agg(count_min_sketch(col("token"),
        lit(0.001d), lit(0.99d), lit(42)).as("sk"))
      val maxOver = toks.groupBy(col("token"))
        .agg(count(lit(1)).as("n_true"))
        .filter(col("n_true") * 100 >= n)
        .crossJoin(broadcast(sk))
        .select((graft.plans.CmsFunctions.cmsEstimate(col("sk"), col("token"))
          - col("n_true")).as("over"))
        .agg(min(col("over")).as("mn"), max(col("over")).as("mx"))
        .collect().head
      assert(maxOver.getLong(0) >= 0, "q67: CMS underestimated — impossible")
      assert(maxOver.getLong(1) <= 0.0005 * n,
        f"q67 margin gone: max overestimate ${maxOver.getLong(1)} vs ${0.0005 * n}%.1f")
    }

    test(s"q40 rank errors stay under HALF the contract allowance at $sfDir") {
      // contract allowance is 0.01*n (10x the sketch's n/1000 bound);
      // require the measured error under 0.005*n — >= 2x margin on the
      // contract, so a Spark-internal sketch change flakes here first
      val ord = Tables.orders(spark, sfDir).select(col("o_totalprice").as("val"))
      val n = ord.count()
      val aps = ord.agg(expr("approx_percentile(val, " +
          "array(0.25D, 0.5D, 0.75D, 0.99D), 1000)").as("ap"))
        .collect().head.getSeq[Double](0)
      Seq(0.25, 0.5, 0.75, 0.99).zip(aps).foreach { case (quant, v) =>
        val rank = ord.filter(col("val") <= v).count()
        val err = math.abs(rank - quant * n)
        assert(err <= 0.005 * n,
          f"q40 margin gone at q=$quant: rank_err=$err%.1f vs 0.005n=${0.005 * n}%.1f")
      }
    }
  }
}
