package graft.api

import org.apache.spark.sql.SparkSession

import graft.llm.{LlmClient, MockLlmClient, TokenTally}

/** Pre-flight pipeline estimation — run the pipeline on a bounded sample of
  * every input dataset, record per-op selectivities and the LLM call/token
  * tally, and extrapolate per-op to the full inputs. The 100 TB
  * pre-flight question is "how many LLM calls and rows will this pipeline
  * actually produce?", and the answer must not cost a full run (the
  * reference's optimizer answers it the same way: sample runs with
  * recorded selectivities, containers.py:454-466).
  *
  * Method: the per-dataset `limit(sampleRows)` pushes into the scan (a
  * 100 TB source reads ~sampleRows rows); full row counts come from
  * `count()` on the raw load — parquet answers from footer metadata
  * without scanning data. Extrapolation fits a per-op POWER LAW from two
  * sample sizes (n and n/2): rowsOut ∝ scale^α with α =
  * log(out_n/out_half) / log(n/half), clamped to [0, 2] — α ≈ 1 recovers
  * the linear estimate exactly for row-local ops, α ≈ 0 captures
  * saturating group-bys (output bounded by distinct keys), α > 1 captures
  * super-linear joins. The two-point fit is itself an approximation
  * (sampling noise moves α), so join/reduce row estimates stay
  * order-of-magnitude — but they no longer systematically explode
  * saturated aggregations the way pure linear scaling does. Disable with
  * `fitExponent = false` for a single-run linear estimate. LLM totals
  * scale by the largest dataset ratio — a deliberate upper bound.
  * Estimation never touches checkpoints (the sample size is part of the
  * dataset hash identity).
  */
object Estimate {

  final case class OpEstimate(
      step: String, op: String,
      sampleRowsIn: Long, sampleRowsOut: Long,
      scale: Double, estRowsOut: Long, alpha: Double = 1.0) {
    def selectivity: Double =
      if (sampleRowsIn == 0) 0.0 else sampleRowsOut.toDouble / sampleRowsIn
  }

  final case class Report(
      sampleRows: Int,
      datasetRows: Map[String, Long],
      datasetScales: Map[String, Double],
      ops: Seq[OpEstimate],
      llmScale: Double,
      estLlm: Map[String, TokenTally.Tally],
      cacheHits: Long = 0L,
      alphaFallbacks: Seq[String] = Nil) {
    def render: String = {
      val opLines = ops.map { o =>
        f"  ${o.step}%-20s ${o.op}%-24s sel=${o.selectivity}%6.3f " +
          f"α=${o.alpha}%4.2f est_rows≈${o.estRowsOut}%,d"
      }
      val llmLines = estLlm.toSeq.sortBy(_._1).map { case (m, t) =>
        f"  $m%-24s calls≈${t.calls}%,d in_tok≈${t.inputTokens}%,d " +
          f"out_tok≈${t.outputTokens}%,d cost≈$$${t.cost}%.2f"
      }
      val warn =
        (if (cacheHits > 0)
           Seq(f"WARNING: $cacheHits%,d sample completions came from a warm " +
             "LLM cache — calls/cost below UNDERCOUNT a cold full run; " +
             "clear the cache (LlmCache.clear) for a cold estimate")
         else Nil) ++
        (if (alphaFallbacks.nonEmpty)
           Seq("NOTICE: α fit fell back to linear for " +
             alphaFallbacks.mkString(", ") + " — the two sample points are " +
             "within ±1-row noise of a linear law (counts too small to " +
             "support a power-law exponent)")
         else Nil)
      (Seq(s"estimate from sample of $sampleRows rows/dataset " +
        s"(scales: ${datasetScales.map { case (k, v) => f"$k=$v%.1fx" }.mkString(", ")})",
        "per-op (two-point power-law fit, est ∝ scale^α; " +
          "join/reduce rows are order-of-magnitude):") ++
        opLines ++ warn ++
        Seq(f"llm totals (scaled ${llmScale}%.1fx, upper bound):") ++
        llmLines).mkString("\n")
    }
  }

  def apply(conf: Conf, spark: SparkSession,
      client: LlmClient = MockLlmClient(), sampleRows: Int = 200,
      fitExponent: Boolean = true): Report = {
    // Full row counts per dataset: parquet/csv/json count on the raw load
    // (parquet = footer metadata only; no parsing tools applied — the
    // dataset's FILE rows are the scale unit).
    val datasetRows: Map[String, Long] =
      conf.get("datasets").map(_.asMap.map { case (name, d) =>
        val full = d.get("format") match {
          case Some(f) => spark.read.format(f.str).load(d("path").str)
          case None    => Pipeline.read(spark, d("path").str)
        }
        name -> full.count()
      }.toMap).getOrElse(Map.empty)
    val datasetScales = datasetRows.map { case (k, n) =>
      k -> math.max(1.0, n.toDouble / sampleRows)
    }

    // Step -> root input dataset (steps can chain through other steps).
    val stepInputs: Map[String, String] =
      conf.get("pipeline").flatMap(_.get("steps")).map(_.asList.map { s =>
        s("name").str -> s.strOr("input", "")
      }.toMap).getOrElse(Map.empty)
    // A step may legally shadow its own input dataset's name ({name: docs,
    // input: docs}); the hop bound also breaks any accidental ref cycle.
    @annotation.tailrec
    def root(name: String, hops: Int = 0): String =
      stepInputs.get(name) match {
        case Some(parent)
            if parent.nonEmpty && parent != name && hops < 1000 =>
          root(parent, hops + 1)
        case _ => name
      }
    def scaleFor(step: String): Double =
      datasetScales.getOrElse(root(step), datasetScales.values.foldLeft(1.0)(math.max))

    TokenTally.reset()
    graft.llm.LlmCache.resetHits()
    // Never touch the real sink: the estimate must not overwrite a full
    // run's output with sampled rows (same strip as Pipeline.describe).
    // runImpl additionally disables checkpoints for sampled runs, so a
    // cached full/previous-estimate op can never replay and zero the tally.
    // The executor-local LLM response cache can still serve repeats (its
    // whole point); the report counts those hits and warns that a
    // warm-cache estimate undercounts a cold full run.
    val (_, _, stats) = Pipeline.runImpl(Pipeline.stripOutput(conf), spark,
      client, track = true, Some(sampleRows))
    val sampleTally = TokenTally.summary
    val cacheHits = graft.llm.LlmCache.hits

    // Half-size pilot (when fitting): its op-level output counts give the
    // second point of the per-op power law. Runs AFTER the measured
    // sample — the reported LLM tally/cache-hit figures above stay those
    // of a cold main run, and the pilot's own completions mostly hit the
    // now-warm response cache (its row set is a subset), so its marginal
    // LLM cost is near zero for deterministic prompts.
    val halfRows = math.max(1, sampleRows / 2)
    val halfStats: Map[(String, String), Long] =
      if (!fitExponent || halfRows >= sampleRows) Map.empty
      else {
        val (_, _, hs) = Pipeline.runImpl(Pipeline.stripOutput(conf), spark,
          client, track = true, Some(halfRows))
        hs.map(s => (s.step, s.op) -> s.rowsOut).toMap
      }

    val fallbacks = Seq.newBuilder[String]
    val ops = stats.map { s =>
      val sc = scaleFor(s.step)
      // α = log(out_n / out_half) / log(n / half), clamped to [0, 2]:
      // α≈1 row-local (exactly linear), α≈0 saturated group-by, α>1
      // super-linear join growth. Degenerate points (zero output at
      // either size, or no pilot) fall back to linear. NOISE GUARD: a
      // ±1-row wobble on either point swings α wildly at tiny counts
      // (out 3 vs half 1 → α ≈ 1.58 from pure noise), so the fit only
      // stands when the linear law (α = 1) lies OUTSIDE the α-interval
      // reachable by moving each point one row — at large counts that
      // envelope is tight and real exponents survive; at tiny counts it
      // is wide and the estimate falls back to linear with a notice. A
      // saturated aggregate (out == half, even at 5 rows) keeps α ≈ 0:
      // its envelope is centered on 0 and excludes 1.
      val logScale = math.log(sampleRows.toDouble / halfRows)
      val alpha = halfStats.get((s.step, s.op)) match {
        case Some(halfOut) if halfOut > 0 && s.rowsOut > 0 =>
          val a = math.log(s.rowsOut.toDouble / halfOut) / logScale
          val aLo = math.log(math.max(s.rowsOut - 1L, 1L).toDouble /
            (halfOut + 1L)) / logScale
          val aHi = math.log((s.rowsOut + 1L).toDouble /
            math.max(halfOut - 1L, 1L)) / logScale
          // STRICTLY inside: an envelope edge landing exactly on 1.0 (e.g.
          // a 3-row saturated group-by, half = out = 3 → aHi = 1.0) is the
          // fit's own boundary, not noise evidence for linearity.
          if (aLo < 1.0 && 1.0 < aHi && math.abs(a - 1.0) > 1e-9) {
            fallbacks += s"${s.step}/${s.op}"
            1.0
          } else math.min(2.0, math.max(0.0, a))
        case _ => 1.0
      }
      OpEstimate(s.step, s.op, s.rowsIn, s.rowsOut, sc,
        math.round(s.rowsOut * math.pow(sc, alpha)), alpha)
    }
    val llmScale = datasetScales.values.foldLeft(1.0)(math.max)
    val estLlm = sampleTally.map { case (m, t) =>
      m -> TokenTally.Tally(
        math.round(t.calls * llmScale),
        math.round(t.inputTokens * llmScale),
        math.round(t.outputTokens * llmScale),
        t.cost * llmScale)
    }
    Report(sampleRows, datasetRows, datasetScales, ops, llmScale, estLlm,
      cacheHits, fallbacks.result())
  }

  def fromYaml(yaml: String, spark: SparkSession,
      client: LlmClient = MockLlmClient(), sampleRows: Int = 200,
      fitExponent: Boolean = true): Report =
    apply(Conf.fromYaml(yaml), spark, client, sampleRows, fitExponent)
}
