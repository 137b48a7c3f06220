package graft.tools

import graft.GraftSession
import graft.dedup.Dedup
import graft.tables.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the near-dup pipeline: replicate the
  * sf0.1 corpus N× with per-copy token prefixes (every shingle differs
  * across copies → zero cross-copy similarity, within-copy near-dup
  * structure preserved exactly), then time the full pipeline at 1× and
  * N×. Linear wall-clock growth = the Σ bucket² candidate bound holds;
  * super-linear growth would mean a hidden n² term. Results feed
  * SCALE.md's claims with measurements instead of assertions.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = GraftSession.getOrCreate("graft-scaleprobe")

    // the near-dup/PageRank/cross-decon probes cut lineage with
    // localCheckpoint; a large-heap JVM barely GCs, so dead blocks pile
    // up across probes and the storage pressure stalls LATER probes at
    // random (observed: the LM probe reading 25× after the checkpointing
    // probes vs 2.3× standalone). Same cure as Bench.clearBlocks: drop
    // persistent RDDs between timed sections.
    def clearBlocks(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      // ContextCleaner only deletes dead shuffle files after the driver
      // GCs their references; without a nudge, tens of GB of shuffle
      // spill from earlier sections linger and skew later sections
      // (observed: pagerank-10x read 66 s in-sequence vs 21 s isolated).
      // The cleaner is ASYNC — give it a beat to drain after the GC, and
      // GC once more for the references the first drain released
      // (observed: ppr-10x read 52 s after two prior sections vs 16 s
      // standalone without the drain window)
      System.gc()
      Thread.sleep(1500)
      System.gc()
    }

    val base = Tables.documents(spark, dir).select("doc_id", "text")

    def replicate(n: Int): DataFrame =
      (0 until n).map { k =>
        base.select(
          (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), "\\s+"),
            t => concat(lit(s"c$k"), t)), " ").as("text"))
      }.reduce(_ union _)

    def time(label: String, docs: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.nearDupPairs(docs, threshold = 0.7).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] $label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      (n, secs)
    }

    // optional 3rd arg: comma-separated substrings — run ONLY the
    // matching sections below and skip the legacy full sweep (local
    // iteration on one family without the ~3-minute full run). In a
    // FULL run the sec() sections execute AFTER the legacy sweep:
    // running them first shifted every legacy section ~6 minutes later
    // into the JVM and behind the BPE probe's multi-GB driver-heap
    // churn, which inflated late legacy sections up to 8× (emb-lsh-10x
    // measured 4.4 s after legacy-first ordering vs 36.9 s after
    // new-first) — section order is part of the measurement protocol.
    val only: Option[Seq[String]] = args.lift(2).map(_.split(",").toSeq)
    val deferred = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    def sec(name: String)(body: => Unit): Unit =
      if (only.forall(_.exists(name.contains)))
        deferred += (() => { body; clearBlocks() })

    // shared bipartite supplier↔customer edges for the graph-family
    // probes (disjoint copies via key offsets preserve per-copy degree
    // structure, so per-iteration work must grow linearly)
    def graphEdges(n: Int): DataFrame = {
      val li0 = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
      val or0 = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
      val pb = li0.join(or0, li0("l_orderkey") === or0("o_orderkey"))
        .select((col("l_suppkey") + 10000000L).as("s"), col("o_custkey").as("c"))
        .distinct()
      (0 until n).map { k =>
        pb.select((col("s") + lit(k.toLong * 100000000L)).as("src"),
          (col("c") + lit(k.toLong * 100000000L)).as("dst"))
      }.reduce(_ union _)
        .unionAll((0 until n).map { k =>
          pb.select((col("c") + lit(k.toLong * 100000000L)).as("src"),
            (col("s") + lit(k.toLong * 100000000L)).as("dst"))
        }.reduce(_ union _))
    }

    // Bootstrap CI (q207 shape): B=200 content-addressed resamples —
    // grid explode × sample join × per-source order stats. The grid is
    // B× the sample, so wall must track corpus size linearly when the
    // per-source sample grows with it.
    sec("bootstrap") {
      import org.apache.spark.sql.expressions.Window
      def run(label: String, docs: DataFrame): Double = {
        val t0 = System.nanoTime()
        val t = docs.select(col("doc_id"), (col("doc_id") % 7).as("source"),
            (length(col("text")).cast("long") % 1000L).as("sc"))
          .localCheckpoint()
        val bySrc = Window.partitionBy("source")
        val r = t.withColumn("rn", row_number().over(bySrc.orderBy("doc_id")) - 1)
          .withColumn("n", count(lit(1)).over(bySrc))
          .localCheckpoint()
        val grid = r.select(col("source"), col("rn"), col("n"),
            explode(sequence(lit(0), lit(199))).as("b"))
          .select(col("source"), col("b"), col("n"),
            pmod(graft.textops.TextAnalysis.md5Long(concat(lit("bs:"),
              col("source"), lit(":"), col("b").cast("string"),
              lit(":"), col("rn").cast("string"))), col("n")).as("pick"))
        val m = grid
          .join(r.select(col("source"), col("rn").as("pick"), col("sc")),
            Seq("source", "pick"))
          .groupBy("source", "b")
          .agg(sum("sc").as("ssum"), max("n").as("nn"))
          .select(col("source"), col("b"), expr("ssum div nn").as("mean_b"))
        val ci = m.withColumn("q", row_number().over(bySrc.orderBy("mean_b", "b")))
          .filter(col("q") === 5 || col("q") === 196)
          .groupBy("source")
          .agg(max(when(col("q") === 5, col("mean_b"))).as("lo"),
            max(when(col("q") === 196, col("mean_b"))).as("hi"))
        val rows = ci.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scaleprobe] bootstrap-$label: sources=$rows time=$secs%.2fs")
        clearBlocks()
        secs
      }
      run("warmup-1x", replicate(1))
      val b1 = run("1x", replicate(1))
      val bn = run(s"${copies}x", replicate(copies))
      println(f"[scaleprobe] bootstrap time ratio=${bn / b1}%.2f for ${copies}x sample " +
        "(grid is B x sample at any scale)")
    }

    // DBSCAN role/cluster resolution (q243 shape, pair list given):
    // degree agg + two core semi-joins + star-contraction CC + border
    // lookup — all equi-joins on node-sized tables; disjoint pair-list
    // copies must scale linearly. Pairs are synthetic (deterministic id
    // arithmetic) so the probe isolates DBSCAN from LSH candidate cost.
    sec("dbscan") {
      def mkPairs(n: Int): (DataFrame, DataFrame) = {
        val ids = (0 until n).map { k =>
          base.select((col("doc_id") + lit(k.toLong * 10000000L)).as("id"))
        }.reduce(_ union _)
        // chain segments of 4 (cores inside, ends are borders) + noise:
        // ids ≡ 0..3 (mod 8) link consecutively; 4..7 stay isolated
        val p = ids.filter(col("id") % 8 < 3)
          .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
        (ids, p)
      }
      def run(label: String, n: Int): Double = {
        val (ids, p) = mkPairs(n)
        val t0 = System.nanoTime()
        val out = graft.similarity.Similarity
          .dbscanFromPairs(ids, p, minPts = 3, idCol = "id")
        val clusters = out.filter(col("role") === "core")
          .select("cluster").distinct().count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scaleprobe] dbscan-$label: coreClusters=$clusters time=$secs%.2fs")
        clearBlocks()
        secs
      }
      run("warmup-1x", 1)
      val d1 = run("1x", 1)
      val dn = run(s"${copies}x", copies)
      println(f"[scaleprobe] dbscan time ratio=${dn / d1}%.2f for ${copies}x pairs")
    }

    // Personalized PageRank (q255 shape): per iteration one edge join +
    // one dst aggregate, mass originating only at seeds — same linear
    // per-round cost contract as global PageRank, plus the seed flags.
    sec("ppr") {
      def run(label: String, n: Int): Double = {
        // pin the synthetic build OUTSIDE the timing (the ANF section's
        // discipline): unpinned, the 2n-copy join lineage re-executes
        // through both the operator's own checkpoint AND the seed-flag
        // join, and the probe times the corpus synthesis, not PPR
        val e = graphEdges(n).localCheckpoint()
        val seeds = e.select(col("src").as("id")).filter(col("id") % 97 === 0)
        val t0 = System.nanoTime()
        val out = graft.graph.Graph
          .personalizedPageRankMicro(e, seeds, iterations = 3)
        val nz = out.filter(col("rank_micro") > 0).count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scaleprobe] ppr-$label: nonzeroNodes=$nz time=$secs%.2fs")
        clearBlocks()
        secs
      }
      run("warmup-1x", 1)
      val pp1 = run("1x", 1)
      val ppn = run(s"${copies}x", copies)
      println(f"[scaleprobe] ppr time ratio=${ppn / pp1}%.2f for ${copies}x edges")
    }

    // ANF reach sketches (q291 shape): h hops of bit_or FM-register
    // propagation — 32 bytes of state per node, one shuffle per hop;
    // disjoint copies must scale linearly per hop.
    sec("anf") {
      def run(label: String, n: Int): Double = {
        val e = graphEdges(n).localCheckpoint()
        val t0 = System.nanoTime()
        val nodes = e.select(col("src").as("id"))
          .union(e.select(col("dst").as("id"))).distinct()
        var sk = nodes.selectExpr("id" +: (0 to 3).map(t =>
            s"abs(hash(id, $t)) AS g$t"): _*)
          .selectExpr("id" +: (0 to 3).map(t =>
            s"CAST(g$t & (-g$t) AS BIGINT) AS s$t"): _*)
          .localCheckpoint()
        (1 to 3).foreach { _ =>
          val inbox = e.join(sk.withColumnRenamed("id", "src"), "src")
            .groupBy(col("dst").as("id"))
            .agg(expr("bit_or(s0)").as("b0"), expr("bit_or(s1)").as("b1"),
              expr("bit_or(s2)").as("b2"), expr("bit_or(s3)").as("b3"))
          sk = sk.join(inbox, Seq("id"), "left_outer")
            .selectExpr("id" +:
              (0 to 3).map(t => s"s$t | coalesce(b$t, 0L) AS s$t"): _*)
            .localCheckpoint()
        }
        val cnt = sk.count()
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[scaleprobe] anf-$label: nodes=$cnt time=$secs%.2fs")
        clearBlocks()
        secs
      }
      run("warmup-1x", 1)
      val an1 = run("1x", 1)
      val ann = run(s"${copies}x", copies)
      println(f"[scaleprobe] anf time ratio=${ann / an1}%.2f for ${copies}x edges")
    }

    // BPE training feasibility at a REAL vocab: 32k merges. The
    // distributed part is ONE word-frequency aggregation; the merge
    // loop is driver-local over the vocab-bounded dict — this probe
    // measures that loop's wall and driver heap. The sf0.1 synthetic
    // corpus holds only 31 distinct words (BPE exhausts at 89 merges),
    // so the 32k-merge regime trains on corpus word-4-GRAM types —
    // tens of thousands of multi-character types with corpus-derived
    // frequencies, the dict-size shape of a real web-corpus vocabulary.
    sec("bpe32k") {
      import java.lang.management.ManagementFactory
      import scala.jdk.CollectionConverters._
      def peakHeap(): Long = ManagementFactory.getMemoryPoolMXBeans.asScala
        .filter(_.getType == java.lang.management.MemoryType.HEAP)
        .map(p => Option(p.getPeakUsage).map(_.getUsed).getOrElse(0L)).sum
      val toks = graft.textops.TextAnalysis.wsTokens(col("text"))
      val gdocs = base.select(array_join(transform(
        sequence(lit(1), greatest(size(toks) - 3, lit(1))),
        i => concat_ws("_", slice(toks, i, lit(4)))), " ").as("text"))
        .localCheckpoint()
      val vocab = gdocs
        .select(explode(graft.textops.TextAnalysis.wsTokens(col("text"))).as("w"))
        .distinct().count()
      ManagementFactory.getMemoryPoolMXBeans.asScala.foreach(_.resetPeakUsage())
      val before = peakHeap()
      val t0 = System.nanoTime()
      val table = graft.textops.TextAnalysis.bpeTrain(gdocs, merges = 32000)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] bpe32k: vocabTypes=$vocab merges=${table.size} " +
        f"time=$secs%.2fs " +
        f"peakHeapDelta=${(peakHeap() - before).toDouble / (1 << 20)}%.0f MiB " +
        "(merge loop is driver-local; corpus work is the one dict aggregation)")
    }

    // Shuffle-BYTE scaling of the keys-only LSH pipelines and the
    // star-contraction CC round shape (round-8 verdict: the §2.3 byte
    // reductions are invisible in sf0.1 wall-clock — measure the bytes
    // themselves). A stage listener accumulates shuffle read/write
    // across every stage of a timed action; 1× vs 10× corpora give the
    // scaling rows for SCALE.md. Listener delivery is async — each
    // snapshot waits for the bus to drain, and nothing else runs
    // concurrently, so the window is exact.
    sec("shuffle-bytes") {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
      val rd = new java.util.concurrent.atomic.AtomicLong
      val wr = new java.util.concurrent.atomic.AtomicLong
      val listener = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            rd.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            wr.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
      }
      spark.sparkContext.addSparkListener(listener)
      def bytes(label: String)(body: => Long): (Long, Long) = {
        Thread.sleep(1500); val r0 = rd.get; val w0 = wr.get
        val n = body
        Thread.sleep(1500)
        val (r, w) = (rd.get - r0, wr.get - w0)
        println(f"[scaleprobe] bytes-$label: rows=$n " +
          f"shuffleRead=${r / 1024}%d KiB shuffleWrite=${w / 1024}%d KiB")
        clearBlocks()
        (r, w)
      }
      // keys-only MinHash LSH (q31/q60/q107 family)
      bytes("minhash-warm")(
        Dedup.nearDupPairs(replicate(1), threshold = 0.7).count())
      val (mr1, _) = bytes("minhash-1x")(
        Dedup.nearDupPairs(replicate(1), threshold = 0.7).count())
      val (mrn, _) = bytes(s"minhash-${copies}x")(
        Dedup.nearDupPairs(replicate(copies), threshold = 0.7).count())
      println(f"[scaleprobe] minhash shuffle-read ratio=" +
        f"${mrn.toDouble / math.max(mr1, 1)}%.2f for ${copies}x docs")
      // keys-only hyperplane LSH, rule-sized (q30/q243/q286 family);
      // same per-copy sign-mask construction as the emb-lsh wall probe
      val embB = Tables.embeddings(spark, dir).select("vec_id", "embedding")
      def flip(n: Int): DataFrame =
        (0 until n).map { k =>
          val rnd = new scala.util.Random(k * 1000003L + 7)
          val mask = array(Array.fill(64)(
            lit(if (rnd.nextBoolean()) 1.0f else -1.0f)): _*)
          embB.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
            zip_with(col("embedding"), mask, (x, m) => x * m).as("embedding"))
        }.reduce(_ union _)
      val (er1, _) = bytes("emb-lsh-1x")(graft.similarity.Similarity
        .embeddingNearDups(flip(1), 0.966, nPlanes = 56, bands = 8).count())
      val (ern, _) = bytes(s"emb-lsh-${copies}x-rule-sized")(
        graft.similarity.Similarity
          .embeddingNearDups(flip(copies), 0.966, nPlanes = 88, bands = 8)
          .count())
      println(f"[scaleprobe] emb-lsh shuffle-read ratio=" +
        f"${ern.toDouble / math.max(er1, 1)}%.2f for ${copies}x corpus")
      // star-contraction CC on a chain (the round-8 one-less-exchange
      // round shape; log-round contraction)
      def chain(n: Long) = spark.range(n)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val (cr1, _) = bytes("cc-chain-1x")(
        Dedup.connectedComponents(chain(100000L), maxIter = 40)
          .select(countDistinct(col("cluster"))).head().getLong(0))
      val (crn, _) = bytes(s"cc-chain-${copies}x")(
        Dedup.connectedComponents(chain(copies * 100000L), maxIter = 40)
          .select(countDistinct(col("cluster"))).head().getLong(0))
      println(f"[scaleprobe] cc shuffle-read ratio=" +
        f"${crn.toDouble / math.max(cr1, 1)}%.2f for ${copies}x chain")
      spark.sparkContext.removeSparkListener(listener)
    }

    if (only.nonEmpty) { deferred.foreach(_()); spark.stop(); return }

    // warm JIT/codegen on the small case first
    time("warmup-1x", replicate(1))
    val (p1, t1) = time("1x", replicate(1))
    val (pn, tn) = time(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] pairs ratio=${pn.toDouble / p1}%.2f (expect ≈$copies), " +
      f"time ratio=${tn / t1}%.2f (linear ⇒ ≈$copies or less with fixed overhead)")

    // chunk-dedup scaling: one hash shuffle + one window — the other
    // shape SCALE.md claims is linear. Same replicated corpus, same
    // shipped operator (Dedup.chunkOwnership) the q73 numbers come from.
    def chunkKept(docs: DataFrame): Long =
      Dedup.chunkOwnership(docs, chunkTokens = 16)
        .filter(col("rn") === 1).count()
    def timeChunks(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val kept = chunkKept(docs)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] chunks-$label: kept=$kept time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeChunks("warmup-1x", replicate(1))
    val c1 = timeChunks("1x", replicate(1))
    val cn = timeChunks(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] chunk-dedup time ratio=${cn / c1}%.2f for ${copies}x data")

    // ANN brute-force top-k scaling: with the two-level top-k the
    // per-query merge receives parts×k rows no matter the corpus size,
    // so wall-clock must track the SCAN (linear), not the merge.
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    def replicateEmb(n: Int): DataFrame =
      (0 until n).map { k =>
        emb.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          col("embedding"))
      }.reduce(_ union _)
    val queries = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_embedding"))
    def timeAnn(label: String, corpus: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.similarity.Similarity.bruteForceTopK(corpus, queries, k = 10).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] ann-$label: rows=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeAnn("warmup-1x", replicateEmb(1))
    val a1 = timeAnn("1x", replicateEmb(1))
    val an = timeAnn(s"${copies}x", replicateEmb(copies))
    println(f"[scaleprobe] ann time ratio=${an / a1}%.2f for ${copies}x corpus " +
      "(merge input is parts×k per query at any scale)")

    // EXACT prefix-filter similarity join scaling: the candidate set is
    // bounded by rare-shingle collisions, so replicated corpora (zero
    // cross-copy similarity) must scale linearly, like the LSH path but
    // with the extra document-frequency shuffle. Tenth-size base corpus:
    // the exact path is the expensive one by design.
    val smallBase = base.filter(col("doc_id") % 10 === 0)
    def replicateSmall(n: Int): DataFrame =
      (0 until n).map { k =>
        smallBase.select(
          (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), "\\s+"),
            t => concat(lit(s"c$k"), t)), " ").as("text"))
      }.reduce(_ union _)
    def timePrefix(label: String, docs: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.prefixFilterNearDups(docs, threshold = 0.7).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] prefix-$label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      (n, secs)
    }
    timePrefix("warmup-1x", replicateSmall(1))
    val (pf1, tf1) = timePrefix("1x", replicateSmall(1))
    val (pfn, tfn) = timePrefix(s"${copies}x", replicateSmall(copies))
    println(f"[scaleprobe] prefix pairs ratio=${pfn.toDouble / math.max(pf1, 1)}%.2f, " +
      f"time ratio=${tfn / tf1}%.2f for ${copies}x data")

    // PageRank scaling: disjoint graph copies (key offsets) — per
    // iteration one edge-shuffle join + one aggregate, so wall-clock
    // must track edge count.
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(spark, dir).select("o_orderkey", "o_custkey")
    val pairsBase = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select((col("l_suppkey") + 10000000L).as("s"), col("o_custkey").as("c"))
      .distinct()
    def replicateEdges(n: Int): DataFrame =
      (0 until n).map { k =>
        pairsBase.select((col("s") + lit(k.toLong * 100000000L)).as("src"),
          (col("c") + lit(k.toLong * 100000000L)).as("dst"))
      }.reduce(_ union _)
        .unionAll(
          (0 until n).map { k =>
            pairsBase.select((col("c") + lit(k.toLong * 100000000L)).as("src"),
              (col("s") + lit(k.toLong * 100000000L)).as("dst"))
          }.reduce(_ union _))
    def timePr(label: String, edges: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.graph.Graph.pageRankMicro(edges, 3).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] pagerank-$label: nodes=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timePr("warmup-1x", replicateEdges(1))
    val g1 = timePr("1x", replicateEdges(1))
    val gn = timePr(s"${copies}x", replicateEdges(copies))
    println(f"[scaleprobe] pagerank time ratio=${gn / g1}%.2f for ${copies}x edges")

    // Equi-depth binning scaling: globalRank's range-partition + narrow
    // binning must track row count — the shape that replaced q99's
    // single-partition ntile window.
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderkey"), (col("o_totalprice") * 100).cast("long").as("cents"))
    def replicateOrders(n: Int): DataFrame =
      (0 until n).map { k =>
        orders.select((col("o_orderkey") + lit(k.toLong * 1000000000L)).as("o_orderkey"),
          col("cents"))
      }.reduce(_ union _)
    def timeBins(label: String, df: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.operators.Scale.equiDepthBins(df, 10, "cents", "o_orderkey")
        .groupBy("bin").count().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] equidepth-$label: bins=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeBins("warmup-1x", replicateOrders(1))
    val b1 = timeBins("1x", replicateOrders(1))
    val bn = timeBins(s"${copies}x", replicateOrders(copies))
    println(f"[scaleprobe] equidepth time ratio=${bn / b1}%.2f for ${copies}x rows")

    // Cross-corpus fuzzy decontamination scaling: the TRAIN side grows,
    // the eval side stays fixed (the production shape) — per-bucket
    // expansion is |train_b|×|eval_b|, so wall-clock must track the
    // train scan + its bucket shuffle, linearly.
    // eval derives from the 1× REPLICA (c0-prefixed tokens), so its docs
    // really match copy-0 of any replicated train side and the exact
    // verify stage has pairs to score at every scale (a raw-text eval
    // would match nothing and leave the verify stage untimed)
    val evalSide = replicate(1).filter(col("doc_id") % 37 === 0)
      .select(col("doc_id"), concat(col("text"), lit(" tail")).as("text"))
    def timeCross(label: String, train: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.crossNearDupPairs(train, evalSide, threshold = 0.7).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] cross-$label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      (n, secs)
    }
    timeCross("warmup-1x", replicate(1))
    val (x1, xt1) = timeCross("1x", replicate(1))
    val (_, xtn) = timeCross(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] cross-decon time ratio=${xtn / xt1}%.2f for ${copies}x train " +
      f"(fixed eval side; 1x pairs=$x1)")

    // Bigram-LM scoring scaling: two count aggs + one join back over the
    // bigram stream — pure shuffle-agg shapes, must be linear.
    def timeLm(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.textops.TextAnalysis.bigramNll(docs).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] lm-$label: docs=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeLm("warmup-1x", replicate(1))
    val l1 = timeLm("1x", replicate(1))
    val ln = timeLm(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] lm time ratio=${ln / l1}%.2f for ${copies}x docs")

    // Classifier-fit scaling: training is ONE moment-sum aggregate over
    // the corpus (the driver solve is O(d³), constant) — wall-clock must
    // track the scan, and the weights must be IDENTICAL at every
    // replication (the same rows contribute the same exact-integer
    // moments regardless of how many disjoint copies surround them —
    // here labels/features are content-derived so each copy adds
    // proportional moments; we check time, not weights, across scales).
    def timeFit(label: String, docs: DataFrame): Double = {
      val toks = split(col("text"), " ")
      val feats = docs.select(
        lit(1L).as("f_bias"),
        size(toks).cast("long").as("f_ntok"),
        floor(size(array_distinct(toks)).cast("long") * 1000000L /
          size(toks).cast("long")).cast("long").as("f_distinct_ppm"),
        when(col("doc_id") % 2 === 0, 1L).otherwise(-1L).as("y"))
      val t0 = System.nanoTime()
      graft.ml.LinearModel.fitRidgeNano(
        feats, Seq("f_bias", "f_ntok", "f_distinct_ppm"), "y", lambda = 1.0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] fit-$label: time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeFit("warmup-1x", replicate(1))
    val f1 = timeFit("1x", replicate(1))
    val fn = timeFit(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] classifier-fit time ratio=${fn / f1}%.2f for ${copies}x docs")

    // Changelog-compaction scaling: partial+final max(struct) — the
    // map-side combine caps the exchange at |keys| rows per task, so
    // wall-clock must track the scan even when every key is hot.
    val ev = Tables.events(spark, dir)
      .select("user_id", "event_type", "event_id", "ts", "value")
    def replicateEv(n: Int): DataFrame =
      (0 until n).map { k =>
        ev.select((col("user_id") + lit(k.toLong * 100000000L)).as("user_id"),
          col("event_type"), col("event_id"), col("ts"), col("value"))
      }.reduce(_ union _)
    def timeCompact(label: String, df: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = df
        .select(col("user_id"), col("event_type"), col("event_id"),
          expr("ts div 1000").as("ts_us"), col("value"))
        .groupBy("user_id", "event_type")
        .agg(max(struct(col("ts_us"), col("event_id"), col("value"))).as("m"))
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] compact-$label: keys=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeCompact("warmup-1x", replicateEv(1))
    val e1 = timeCompact("1x", replicateEv(1))
    val en = timeCompact(s"${copies}x", replicateEv(copies))
    println(f"[scaleprobe] compaction time ratio=${en / e1}%.2f for ${copies}x events")

    // SemDeDup scaling: k scales WITH the corpus (the paper's regime —
    // constant mean cluster size), so Σ cluster² grows linearly and
    // wall-clock must track the scan + the k-means rounds, never n².
    def timeSem(label: String, corpus: DataFrame, k: Int): Double = {
      val t0 = System.nanoTime()
      val n = graft.similarity.Similarity
        .semDedup(corpus, k = k, iters = 2, threshold = 0.99)
        .filter(!col("kept")).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] semdedup-$label: dropped=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeSem("warmup-1x", replicateEmb(1), k = 16)
    val s1 = timeSem("1x", replicateEmb(1), k = 16)
    val sn = timeSem(s"${copies}x", replicateEmb(copies), k = 16 * copies)
    println(f"[scaleprobe] semdedup time ratio=${sn / s1}%.2f for ${copies}x corpus " +
      "(k grows with n: constant mean cluster size)")

    // Dedup-REWRITE scaling: min-owner agg + hash join + per-doc
    // re-assembly — three shuffles, all partial-agg or equi-join; the
    // replicated corpus (zero cross-copy chunk overlap) must be linear.
    def timeRewrite(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = Dedup.dedupRewrite(docs, chunkTokens = 16)
        .agg(sum("n_kept")).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] rewrite-$label: kept=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeRewrite("warmup-1x", replicate(1))
    val w1 = timeRewrite("1x", replicate(1))
    val wn = timeRewrite(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] rewrite time ratio=${wn / w1}%.2f for ${copies}x data")

    // Memorization-risk scaling: stride-1 window hash counts + join-back
    // + per-doc agg — window-grain rows but every stage is a partial agg
    // or hash equi-join, so replicated corpora (disjoint window hashes
    // across copies) must be linear.
    def timeMemRisk(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = Dedup.memorizationRisk(docs, l = 16, minCount = 2)
        .agg(sum("dup_windows")).collect()(0).getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] memrisk-$label: dup_windows=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeMemRisk("warmup-1x", replicate(1))
    val m1 = timeMemRisk("1x", replicate(1))
    val mn = timeMemRisk(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] memrisk time ratio=${mn / m1}%.2f for ${copies}x data")

    // Containment-join scaling: df-capped gram equi-join (Σ df² bound).
    // Replicated copies share no grams (per-copy token prefixes), so
    // candidate fan-out — and wall-clock — must stay linear. Tenth-size
    // base corpus like the prefix-filter probe: pair joins are the
    // expensive family by design.
    def timeContain(label: String, docs: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.containmentPairs(docs, k = 5, tauBp = 5000, dfCap = 100).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] contain-$label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      (n, secs)
    }
    timeContain("warmup-1x", replicateSmall(1))
    val (ct1pairs, ct1) = timeContain("1x", replicateSmall(1))
    val (ctnpairs, ctn) = timeContain(s"${copies}x", replicateSmall(copies))
    println(f"[scaleprobe] containment pairs ratio=${ctnpairs.toDouble / math.max(ct1pairs, 1)}%.2f, " +
      f"time ratio=${ctn / ct1}%.2f for ${copies}x data")

    // Weighted-jaccard join scaling: same zero-cross-similarity
    // replication — weighted prefix postings and Σ prefix-df² pair
    // fan-out must stay linear in copies.
    def timeWjj(label: String, docs: DataFrame): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = Dedup.weightedJaccardJoin(docs, tauBp = 6000).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] wjj-$label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      (n, secs)
    }
    timeWjj("warmup-1x", replicateSmall(1))
    val (wj1pairs, wj1) = timeWjj("1x", replicateSmall(1))
    val (wjnpairs, wjn) = timeWjj(s"${copies}x", replicateSmall(copies))
    println(f"[scaleprobe] wjj pairs ratio=${wjnpairs.toDouble / math.max(wj1pairs, 1)}%.2f, " +
      f"time ratio=${wjn / wj1}%.2f for ${copies}x data")

    // Containment persistent-block footprint: the one-shuffle shape
    // (capped bounded-heap collect per gram) pins NOTHING in executor
    // block storage — reported vs what persisting the full explode
    // would cost on a boilerplate-heavy corpus (shared template prefix
    // in every doc). Must be 0.
    def storedBytes(): Long =
      spark.sparkContext.getRDDStorageInfo
        .map(i => i.memSize + i.diskSize).sum
    val boiler = base.limit(500).select(col("doc_id"),
      concat(lit(("the quick brown fox jumps over the lazy dog and " * 8)),
        col("text")).as("text"))
    val explodedBytes = {
      import org.apache.spark.storage.StorageLevel
      val g = boiler.select(col("doc_id"),
        explode(array_distinct(graft.textops.TextAnalysis
          .shingles(col("text"), 5))).as("g")).persist(StorageLevel.MEMORY_AND_DISK)
      g.count()
      val b = storedBytes()
      g.unpersist(true)
      b
    }
    clearBlocks()
    Dedup.containmentPairs(boiler, k = 5, tauBp = 5000, dfCap = 100).count()
    val checkpointedBytes = storedBytes()
    clearBlocks()
    println(f"[scaleprobe] containment checkpoint bytes=$checkpointedBytes " +
      f"vs full-explode bytes=$explodedBytes " +
      f"(ratio=${checkpointedBytes.toDouble / math.max(explodedBytes, 1)}%.3f — " +
      "one-shuffle capped-collect shape pins no executor blocks)")

    // MMR selection: per-step cost is O(n·d) via the running penalty
    // column (one cosine against the latest pick), so total work — and
    // wall-clock — must grow ~linearly in k; the recompute-from-scratch
    // form would grow ~quadratically (step i pays i cosines per row).
    val mmrCorpus = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val qv: Seq[Float] = mmrCorpus.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0)
    def timeMmr(label: String, k: Int): Double = {
      val t0 = System.nanoTime()
      graft.similarity.Similarity.mmrSelect(mmrCorpus, qv, k = k).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] mmr-$label: k=$k time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeMmr("warmup", 8)
    val mm1 = timeMmr("k8", 8)
    val mm4 = timeMmr("k32", 32)
    println(f"[scaleprobe] mmr time ratio=${mm4 / mm1}%.2f for 4x k " +
      "(linear ⇒ ≈4; the recompute-from-scratch form ⇒ ≈16)")

    // Label propagation: same per-iteration join+agg shape as PageRank
    // (one shuffle on src, one two-key aggregate), so wall-clock must
    // track |E| linearly across the replicated disjoint copies.
    def timeLpa(label: String, edges: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.graph.Graph.labelPropagation(edges, 3).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] lpa-$label: nodes=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeLpa("warmup-1x", replicateEdges(1))
    val lp1 = timeLpa("1x", replicateEdges(1))
    val lpn = timeLpa(s"${copies}x", replicateEdges(copies))
    println(f"[scaleprobe] lpa time ratio=${lpn / lp1}%.2f for ${copies}x edges")

    // Domain re-weighting: the bigram-LM chain (already probed above as
    // lm-*) plus a source-grain agg and two 1-row broadcasts — the
    // extra work over bigramNll must be corpus-size independent, so the
    // ratio should match the lm probe's.
    def withSource(docs: DataFrame): DataFrame =
      docs.withColumn("source",
        concat(lit("src"), pmod(col("doc_id"), lit(20)).cast("string")))
    def timeRw(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.textops.TextAnalysis.domainReweight(withSource(docs)).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] reweight-$label: sources=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeRw("warmup-1x", replicate(1))
    val rw1 = timeRw("1x", replicate(1))
    val rwn = timeRw(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] reweight time ratio=${rwn / rw1}%.2f for ${copies}x docs")

    // PQ ANN: train (narrow assign + fixed m·k centroid agg) + encode +
    // ADC search (narrow scan, bounded top-k) — every stage is linear in
    // corpus rows, so end-to-end wall-clock must track N.
    val pqQueries = queries // same fixed query set as the ann probe
    def timePq(label: String, corpus: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.similarity.Similarity.pqTopK(corpus, pqQueries, topK = 5).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] pq-$label: rows=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timePq("warmup-1x", replicateEmb(1))
    val pq1 = timePq("1x", replicateEmb(1))
    val pqn = timePq(s"${copies}x", replicateEmb(copies))
    println(f"[scaleprobe] pq time ratio=${pqn / pq1}%.2f for ${copies}x corpus")

    // Image dHash: the decode+hash pass is narrow (payloads never
    // shuffle) — probed on replicated docs. The banded pair join is
    // probed separately on md5-scattered hash tables (no planted
    // collisions) so bucket sizes stay O(1) and the measured growth is
    // the shuffle itself; the catalog's 40-base synthetic corpus is
    // DELIBERATELY degenerate (copy-heavy) and would probe Σ bucket²
    // blowup instead — the documented run-exact-dedup-first case.
    def timeHash(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val media = graft.multimodal.Multimodal.syntheticImagesFromDocuments(spark, docs)
      val n = graft.multimodal.Multimodal.imageDHash(spark, media).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] phash-$label: hashed=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeHash("warmup-1x", replicate(1))
    val ph1 = timeHash("1x", replicate(1))
    val phn = timeHash(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] phash decode+hash time ratio=${phn / ph1}%.2f for ${copies}x images")
    def scatterHashes(n: Int): DataFrame = {
      import graft.textops.TextAnalysis.md5Long
      replicate(n).select(col("doc_id").as("media_id") +:
        (0 until 4).map(b =>
          pmod(md5Long(concat_ws("|", col("doc_id").cast("string"), lit(b.toString))),
            lit(65536)).cast("int").as(s"b$b")): _*)
    }
    def timeBand(label: String, hashes: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.multimodal.Multimodal.imageNearDupPairs(spark, hashes).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] phashjoin-$label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeBand("warmup-1x", scatterHashes(1))
    val pb1 = timeBand("1x", scatterHashes(1))
    val pbn = timeBand(s"${copies}x", scatterHashes(copies))
    println(f"[scaleprobe] phash band-join time ratio=${pbn / pb1}%.2f for ${copies}x hashes")

    // Exact AUC: corpus aggregates once into a bounded score histogram;
    // the prefix sum runs over the HISTOGRAM (same distinct-score count
    // at any N), so growth is the corpus scan alone.
    def timeAuc(label: String, docs: DataFrame): Double = {
      val toks = split(col("text"), "\\s+")
      val scored = docs.select(
        (pmod(col("doc_id"), lit(5)) === 0).as("pos"),
        pmod(size(toks).cast("long") * 37L, lit(1000L)).as("score"))
      val t0 = System.nanoTime()
      graft.ml.Eval.aucExact(scored, "score", "pos").collect()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] auc-$label: time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeAuc("warmup-1x", replicate(1))
    val au1 = timeAuc("1x", replicate(1))
    val aun = timeAuc(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] auc time ratio=${aun / au1}%.2f for ${copies}x docs")

    // Triangle counting: disjoint edge copies (node-id offsets) keep the
    // per-copy degree structure, so the degree-ordered wedge volume —
    // the dominant term — grows exactly linearly; wall must track it.
    def triEdges(n: Int): DataFrame = {
      val li = (0 until n).map { k =>
        Tables.lineitem(spark, dir)
          .filter(col("l_orderkey") % 3 === 0 && col("l_partkey") % 2 === 0)
          .select((col("l_orderkey") + lit(k.toLong * 100000000L)).as("o"),
            (col("l_partkey") + lit(k.toLong * 10000000L)).as("p"))
      }.reduce(_ union _)
      li.as("x").join(li.as("y"),
          col("x.o") === col("y.o") && col("x.p") < col("y.p"))
        .select(col("x.p").as("u"), col("y.p").as("v"))
    }
    def timeTri(label: String, edges: DataFrame): Double = {
      val t0 = System.nanoTime()
      val r = graft.graph.Graph.triangleCount(edges).head()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] tri-$label: triangles=${r.getLong(2)} time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeTri("warmup-1x", triEdges(1))
    val tr1 = timeTri("1x", triEdges(1))
    val trn = timeTri(s"${copies}x", triEdges(copies))
    println(f"[scaleprobe] triangles time ratio=${trn / tr1}%.2f for ${copies}x edges")

    // RA link prediction (q229 shape): hub-capped wedge join — disjoint
    // copies preserve per-copy degrees, so capped wedge volume
    // (Σ min(deg,64)²) grows linearly; wall must track it.
    def timeLink(label: String, edges: DataFrame): Double = {
      val t0 = System.nanoTime()
      val e0 = edges.distinct()
      val adj = e0.select(col("u").as("z"), col("v").as("n"))
        .unionAll(e0.select(col("v").as("z"), col("u").as("n")))
      val deg = adj.groupBy("z").agg(count(lit(1)).as("d"))
      val piv = adj.join(deg, "z").filter(col("d") <= 64)
      val cand = piv.as("x").join(piv.as("y"),
          col("x.z") === col("y.z") && col("x.n") < col("y.n"))
        .groupBy(col("x.n").as("u"), col("y.n").as("v"))
        .agg(sum(expr("1000000 div x.d")).as("ra_micro"))
      val n = cand.join(e0, cand("u") === e0("u") && cand("v") === e0("v"),
        "left_anti").count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] link-$label: candidates=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeLink("warmup-1x", triEdges(1))
    val lk1 = timeLink("1x", triEdges(1))
    val lkn = timeLink(s"${copies}x", triEdges(copies))
    println(f"[scaleprobe] link time ratio=${lkn / lk1}%.2f for ${copies}x edges")

    // CDC chunking: per-doc windows + one chunk-hash agg — wall must be
    // linear in corpus tokens (prefixed copies keep chunk statistics).
    def timeCdc(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = Dedup.cdcChunks(docs)
        .groupBy("chunk_hash").count().filter(col("count") >= 2).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] cdc-$label: sharedChunks=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeCdc("warmup-1x", replicate(1))
    val cd1 = timeCdc("1x", replicate(1))
    val cdn = timeCdc(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] cdc time ratio=${cdn / cd1}%.2f for ${copies}x tokens")

    // Aho-Corasick blocklist: ONE automaton pass per row vs k contains()
    // scans — wall must stay flat as the term list grows 16x, where the
    // composed form grows with k.
    val acTerms: Seq[String] = (0 until 256).map(i => s"zz${i}q needle")
    def timeAc(label: String, terms: Seq[String]): Double = {
      val t0 = System.nanoTime()
      val n = base.select(graft.functions.MultiMatchFunctions
          .graftMultiMatch(col("text"), terms).as("m"))
        .filter(size(col("m")) > 0).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] ac-$label: hits=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    def timeContains(label: String, terms: Seq[String]): Double = {
      val t0 = System.nanoTime()
      val n = base.select(sort_array(filter(typedLit(terms),
          t => contains(col("text"), t))).as("m"))
        .filter(size(col("m")) > 0).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] contains-$label: hits=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeAc("warmup", acTerms.take(16))
    val ac16 = timeAc("16-terms", acTerms.take(16))
    val ac256 = timeAc("256-terms", acTerms)
    val co16 = timeContains("16-terms", acTerms.take(16))
    val co256 = timeContains("256-terms", acTerms)
    println(f"[scaleprobe] ac growth=${ac256 / ac16}%.2f vs contains growth=" +
      f"${co256 / co16}%.2f for 16x terms (automaton must stay ~flat)")

    // langId: one graft_multi_count automaton pass vs 25 composed
    // length-replace passes — same labels, the constant factor is the
    // whole point.
    def timeLang(label: String, f: org.apache.spark.sql.Column =>
        org.apache.spark.sql.Column): Double = {
      val t0 = System.nanoTime()
      base.select(f(col("text")).as("l")).groupBy("l").count().count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] langid-$label: time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeLang("warmup", graft.textops.TextAnalysis.langId)
    val lgFast = timeLang("automaton", graft.textops.TextAnalysis.langId)
    val lgComp = timeLang("composed", graft.textops.TextAnalysis.langIdComposed)
    println(f"[scaleprobe] langid composed/automaton=${lgComp / lgFast}%.2fx " +
      "(one AC pass replaces 25 replace passes)")

    // C4 line filter: pure higher-order array exprs, one narrow scan —
    // wall must be linear in corpus size.
    def timeC4(label: String, docs: DataFrame): Double = {
      val t0 = System.nanoTime()
      val n = graft.textops.TextAnalysis.c4LineFilter(
        docs.select(col("doc_id"), transform(
          sequence(lit(0), shiftright(size(split(col("text"), " ")) + 7, 3) - 1),
          i => concat(array_join(
            slice(split(col("text"), " "), i * 8 + 1, lit(8)), " "), lit(".")))
          .as("lines"))).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] c4-$label: kept=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeC4("warmup-1x", replicate(1))
    val c41 = timeC4("1x", replicate(1))
    val c4n = timeC4(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] c4 time ratio=${c4n / c41}%.2f for ${copies}x docs")

    // survivorship: components + two cluster-keyed aggs — linear in
    // members (the near-dup pair generation is probed separately above).
    def timeGolden(label: String, docs: DataFrame): Double = {
      val pairs = docs.filter(col("doc_id") % 10 < 3)
        .select(col("doc_id").as("id_a"), (col("doc_id") + 1).as("id_b"))
      val t0 = System.nanoTime()
      val n = Dedup.goldenRecords(
        docs.withColumn("source", concat(lit("s"), col("doc_id") % 7)),
        pairs).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] golden-$label: clusters=$n time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeGolden("warmup-1x", replicate(1))
    val go1 = timeGolden("1x", replicate(1))
    val gon = timeGolden(s"${copies}x", replicate(copies))
    println(f"[scaleprobe] golden time ratio=${gon / go1}%.2f for ${copies}x members")

    // connected components on a CHAIN — the adversarial topology for
    // component resolution: diameter = n, so 1-hop propagation needs n
    // rounds (unrunnable here) while star contraction needs ~log2(n).
    // 10× the chain should add ~constant rounds (log 10 ≈ 3), so wall
    // grows far SLOWER than data — the property SCALE.md claims.
    def timeChain(label: String, n: Long): Double = {
      val pairs = spark.range(n)
        .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
      val t0 = System.nanoTime()
      val comps = Dedup.connectedComponents(pairs, maxIter = 40)
        .select(countDistinct(col("cluster"))).head().getLong(0)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] cc-chain-$label: n=$n components=$comps time=$secs%.2fs")
      clearBlocks()
      secs
    }
    timeChain("warmup", 10000L)
    val cc1 = timeChain("1x", 100000L)
    val ccn = timeChain(s"${copies}x", copies * 100000L)
    println(f"[scaleprobe] cc-chain time ratio=${ccn / cc1}%.2f for ${copies}x " +
      "chain length (log-round contraction ⇒ well below data ratio)")

    // embedding hyperplane-LSH near-dup (the q30/q243 candidate
    // generator, now the slowest bench headline's first stage): each
    // copy gets a deterministic per-copy ±1 sign mask — WITHIN-copy
    // cosines are preserved exactly (both sides flip identically) while
    // cross-copy dots scramble to ~0, so pairs must grow exactly
    // linearly and wall must track the Σ bucket² candidate bound, never
    // pairs².
    // per-copy mask from a seeded PRNG — a linear-in-(k,i) parity trick
    // is NOT enough (parity of a·k+b·i repeats with small period in k,
    // making some copy pairs identical — observed as a 40k cross-copy
    // pair explosion before this fix)
    def flipEmb(n: Int): DataFrame =
      (0 until n).map { k =>
        val rnd = new scala.util.Random(k * 1000003L + 7)
        val mask = array(Array.fill(64)(
          lit(if (rnd.nextBoolean()) 1.0f else -1.0f)): _*)
        emb.select((col("vec_id") + lit(k.toLong * 10000000L)).as("vec_id"),
          zip_with(col("embedding"), mask, (x, m) => x * m).as("embedding"))
      }.reduce(_ union _)
    // THE SIZING RULE IS THE PROBE: with knobs held fixed at the q243
    // sizing (56/8 = 7 bits/band), 10× data measured 45× wall — the
    // candidate surface grows n²/2^r when bucket space stays constant.
    // The documented rule adds log2(copies) sign bits per band
    // (7 → 11 ⇒ 88 planes / 8 bands), which per-band Long buckets can
    // hold (63-bit/band ceiling); wall must then track the data.
    def timeLsh(label: String, corpus: DataFrame, nPlanes: Int): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = graft.similarity.Similarity
        .embeddingNearDups(corpus, threshold = 0.966,
          nPlanes = nPlanes, bands = 8).count()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] emb-lsh-$label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      (n, secs)
    }
    timeLsh("warmup-1x", flipEmb(1), 56)
    val (el1, et1) = timeLsh("1x", flipEmb(1), 56)
    val (eln, etn) = timeLsh(s"${copies}x-rule-sized", flipEmb(copies), 88)
    println(f"[scaleprobe] emb-lsh pairs ratio=${eln.toDouble / math.max(el1, 1)}%.2f " +
      f"time ratio=${etn / et1}%.2f for ${copies}x corpus " +
      "(sign-masked copies; bits/band grown by log2 copies per the sizing rule)")

    // winnowing fingerprint matching (the q294 shape): per-copy token
    // prefixes change every gram, so cross-copy fingerprints never
    // collide and the pair count must replicate exactly linearly. Also
    // measures the native graft_winnow kernel against the composed
    // array_distinct/transform/array_min form it replaced — the
    // interpreted-HOF tax grows with corpus size, the kernel's doesn't.
    def winnowPairs(docs: DataFrame, native: Boolean): Long = {
      val hs = graft.functions.GramHashFunctions
        .graftGramMd5(graft.textops.TextAnalysis.wsTokens(col("text")), 3)
      val fcol =
        if (native) graft.functions.WinnowFunctions.graftWinnow(hs, 4)
        else when(size(hs) < 4, array(array_min(hs)))
          .otherwise(array_distinct(transform(
            sequence(lit(1), size(hs) - 3), i => array_min(slice(hs, i, lit(4))))))
      val fps = docs.select(col("doc_id"), explode(fcol).as("fp"))
      val capped = fps.join(
        fps.groupBy("fp").agg(count(lit(1)).as("df")).filter(col("df") <= 50)
          .select("fp"), "fp")
      capped.as("a").join(capped.as("b"), Seq("fp"))
        .filter(col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id"), col("b.doc_id"))
        .agg(count(lit(1)).as("nfp")).filter(col("nfp") >= 2).count()
    }
    def timeWinnow(label: String, docs: DataFrame, native: Boolean): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = winnowPairs(docs, native)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[scaleprobe] winnow-$label: pairs=$n time=$secs%.2fs")
      clearBlocks()
      (n, secs)
    }
    // warm BOTH variants before the timed runs — codegen/JIT warmup on
    // only one side would inflate the reported speedup
    timeWinnow("warmup-1x-native", replicate(1), native = true)
    timeWinnow("warmup-1x-composed", replicate(1), native = false)
    val (wp1, wt1) = timeWinnow("1x-native", replicate(1), native = true)
    val (wpn, wtn) = timeWinnow(s"${copies}x-native", replicate(copies), native = true)
    val (_, wc1) = timeWinnow("1x-composed", replicate(1), native = false)
    println(f"[scaleprobe] winnow pairs ratio=${wpn.toDouble / math.max(wp1, 1)}%.2f " +
      f"(expect ≈$copies), time ratio=${wtn / wt1}%.2f; " +
      f"native vs composed at 1x: ${wc1 / wt1}%.1fx faster")

    // round-7 sections (bootstrap/dbscan/ppr/anf/bpe32k) — after the
    // legacy sweep, see the ordering note at sec()
    deferred.foreach(_())
    spark.stop()
  }
}
