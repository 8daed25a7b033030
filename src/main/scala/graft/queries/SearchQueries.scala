package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Search, Sketches}

/** Full-text retrieval + sketch-accelerated counting over `documents`:
  * the corpus-query side of a training-data platform (audit what the
  * corpus contains, pull passages, find every mention) and the
  * Count-Min prune→exact-verify heavy-hitter pattern. Scoring is exact
  * int64 fixed-point and every hash is the portable md5 device, so all
  * queries — including the sketch internals — hash-match their DuckDB
  * oracles.
  */
object SearchQueries {

  /** The one query-term set the ranked/boolean examples share. */
  private val Terms = Seq("join", "vector", "spark")

  private def deleteRecursivelyOnExit(p: java.nio.file.Path): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.Files
      import scala.util.Try
      Try {
        val walk = Files.walk(p)
        try walk.sorted(java.util.Comparator.reverseOrder())
          .forEach(f => { Try(Files.delete(f)); () })
        finally walk.close()
      }
      ()
    }))

  /** Token-bigram item stream — the heavy-hitter unit (916 distinct
    * bigrams at sf0.01 vs the ~30-word unigram vocabulary where
    * everything is heavy; bigrams actually exercise the CMS width-256
    * collision behavior). zip_with over a MATERIALIZED split array (the
    * lambda-CSE rule: inline split inside a HOF re-splits per element).
    */
  private def bigrams(docs: DataFrame): DataFrame =
    docs.select(split(col("text"), " ").as("s"))
      .select(explode(zip_with(
        slice(col("s"), lit(1), size(col("s")) - 1),
        slice(col("s"), lit(2), size(col("s")) - 1),
        (a, b) => concat(a, lit(" "), b))).as("item"))

  private val BigramCte =
    """b AS (SELECT unnest([s[k] || ' ' || s[k+1] for k in range(1, len(s))]) AS item
      |      FROM (SELECT string_split(text, ' ') AS s FROM documents))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "inverted_postings" -> { (spark, dir) =>
      // The inverted-index core as rows: (token, doc, tf). Restricted
      // to 40 docs so the dump stays bounded; the op itself is one
      // explode + partial-agg groupBy at any scale.
      import spark.implicits._
      Search.postings(Tables.documents(spark, dir).filter($"doc_id" < 40))
        .orderBy("token", "doc_id")
    },

    "ranked_search" -> { (spark, dir) =>
      // BM25-shaped ranked retrieval (k1/b saturation + length norm,
      // rational rarity weight — see Search.rankedSearch for why the
      // log stays out) over the whole corpus for a 3-term query.
      Search.rankedSearch(Tables.documents(spark, dir), Terms, k = 20)
    },

    "boolean_search" -> { (spark, dir) =>
      // Conjunction + negation: docs with BOTH 'join' and 'vector' and
      // no 'spark', relevance hint = summed tf of the required terms.
      import spark.implicits._
      Search.booleanSearch(Tables.documents(spark, dir),
          all = Seq("join", "vector"), none = Seq("spark"))
        .orderBy("doc_id")
    },

    "phrase_search" -> { (spark, dir) =>
      // Exact consecutive-token phrase occurrences (0-based start
      // position) via the positional postings join chain.
      import spark.implicits._
      Search.phraseSearch(Tables.documents(spark, dir),
          Seq("join", "hash"))
        .orderBy("doc_id", "start_pos")
    },

    "ranked_search_stored" -> { (spark, dir) =>
      // The STORED-index variant of ranked_search (the
      // dedup_stored_increment pattern): postings + additive stats
      // built as two separate batches (BuildTextIndex's batch layout),
      // folded by the same summedStats/scoredTopK bodies the disk path
      // uses (JobsSpec pins disk = memory), and searched WITHOUT
      // touching the corpus — the oracle recomputes from raw text, so
      // any drift in the postings layout, the additive meta fold, or
      // the shared scorer hash-mismatches.
      import spark.implicits._
      import graft.jobs.BuildTextIndex
      val docs = Tables.documents(spark, dir)
      val h1 = docs.filter($"doc_id" < 250)
      val h2 = docs.filter($"doc_id" >= 250)
      val terms = Seq("hash", "scan", "stream")
      val post = BuildTextIndex.postingsTable(h1)
        .unionByName(BuildTextIndex.postingsTable(h2))
        .filter($"token".isin(terms: _*))
        .select($"token", $"doc_id", $"dl", $"tf")
      val stats = BuildTextIndex.summedStats(
        BuildTextIndex.statsTable(h1).unionByName(BuildTextIndex.statsTable(h2)))
      graft.ops.Search.scoredTopK(post, stats, k = 15, "doc_id")
    },

    "proximity_search" -> { (spark, dir) =>
      // NEAR retrieval: 'data' within 3 tokens of 'vector', with the
      // co-occurrence count and the closest distance per doc.
      import spark.implicits._
      Search.proximitySearch(Tables.documents(spark, dir),
          "data", "vector", window = 3)
        .orderBy("doc_id")
    },

    "passage_pull" -> { (spark, dir) =>
      // The RAG pull: every occurrence of 'vector' with its +-3-token
      // context. Entirely map-side — no join, no shuffle beyond the
      // presentation sort; restricted to 50 docs to bound the dump.
      import spark.implicits._
      Search.passages(Tables.documents(spark, dir).filter($"doc_id" < 50),
          "vector", window = 3)
        .orderBy("doc_id", "center")
    },

    "heavy_hitters_cms" -> { (spark, dir) =>
      // EXACT heavy hitters with the Count-Min prune: bigrams at or
      // above 1/1024 of the stream, counted exactly — only occurrences
      // the sketch cannot prove light enter the exact aggregate. The
      // threshold is corpus-relative (non-trivial at every SF) and
      // derived FROM the counter table itself — any one sketch row
      // sums every occurrence — so the whole query is two corpus
      // passes, never three; the oracle's scalar subquery is the SQL
      // twin of that total.
      import spark.implicits._
      Sketches.cmsHeavyHittersAtFraction(
          bigrams(Tables.documents(spark, dir)), divisor = 1024L)
        .orderBy($"n_occurrences".desc, $"item")
    },

    "heavy_hitters_merged" -> { (spark, dir) =>
      // The INCREMENTAL form: two per-batch counter tables (the hourly
      // fold-once shape) merged cell-wise, then probed over the full
      // stream — exactly the plain GROUP BY HAVING answer, pinned by
      // the same oracle family as heavy_hitters_cms. A merge that
      // dropped or double-added any cell could only ever lose true
      // heavies (under-estimate) or admit fake ones the exact verify
      // can't trim below threshold... either way a hash mismatch.
      import spark.implicits._
      val docs = Tables.documents(spark, dir)
      val items = bigrams(docs)
      val counters = Sketches.mergeCounters(Seq(
        Sketches.cmsCounters(bigrams(docs.filter($"doc_id" < 250))),
        Sketches.cmsCounters(bigrams(docs.filter($"doc_id" >= 250)))))
      Sketches.cmsHeavyHittersWithCounters(items, counters, threshold = 40L)
        .orderBy($"n_occurrences".desc, $"item")
    },

    "ranked_search_deleted" -> { (spark, dir) =>
      // The takedown lifecycle under a full oracle: a REAL stored index
      // is built on disk, every doc_id % 5 == 0 is tombstoned via
      // deleteDocs, and the pruned-read search runs. The oracle
      // recomputes BM25 from raw text over only the SURVIVING docs, so
      // both the match set and the shifted corpus statistics
      // (n_docs / avgdl / df all change when docs leave) hash-match —
      // a wrong decrement row or a leaky anti-join mis-ranks here.
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-del-store")
      val docs = Tables.documents(spark, dir)
      val allP = s"$base/all"; val delP = s"$base/dels"
      // two independent staging writes — overlap them (guide §2.6)
      graft.jobs.Overlap.all(
        () => docs.select($"doc_id", $"text")
          .write.mode("overwrite").parquet(allP),
        () => docs.filter($"doc_id" % 5 === 0).select($"doc_id")
          .write.mode("overwrite").parquet(delP))
      val out = s"$base/index"
      graft.jobs.BuildTextIndex.run(spark, allP, out)
      graft.jobs.BuildTextIndex.deleteDocs(spark, delP, out, "takedown")
      graft.jobs.BuildTextIndex.searchStored(spark, out,
        Seq("hash", "scan", "stream"), k = 15)
    },

    "heavy_hitters_stored" -> { (spark, dir) =>
      // The DURABLE incremental form (r10 verdict top item): THREE
      // per-batch counter tables persisted to a real BuildSketchStore
      // (counters/batch=<id>/ + per-batch geometry meta), merged at
      // read through the loud geometry gate, probed over the full
      // stream — exactly the plain GROUP BY HAVING answer. Any drift
      // in the store layout, the per-batch fold, the meta discipline,
      // or the merge hash-mismatches against the raw-text oracle.
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-sketch-store")
      val docs = Tables.documents(spark, dir)
      val out = s"$base/store"
      def slice(lo: Int, hi: Int, p: String): String = {
        bigrams(docs.filter($"doc_id" >= lo && $"doc_id" < hi))
          .write.mode("overwrite").parquet(p); p
      }
      // the three slice stagings are independent writes, and the two
      // appends land DISJOINT batch directories after the base exists —
      // overlap each group (guide §2.6); the store's ordered windows
      // (run-before-append, counters-before-meta) stay sequential
      graft.jobs.Overlap.all(
        () => slice(0, 200, s"$base/h0"): Unit,
        () => slice(200, 350, s"$base/h1"): Unit,
        () => slice(350, Int.MaxValue, s"$base/h2"): Unit)
      graft.jobs.BuildSketchStore.run(spark, s"$base/h0", out)
      graft.jobs.Overlap.all(
        () => graft.jobs.BuildSketchStore.append(spark, s"$base/h1", out, "h1"),
        () => graft.jobs.BuildSketchStore.append(spark, s"$base/h2", out, "h2"))
      graft.jobs.BuildSketchStore.heavyHitters(spark, out,
          bigrams(docs), threshold = 35L)
        .orderBy($"n_occurrences".desc, $"item")
    },

    "heavy_hitters_asof" -> { (spark, dir) =>
      // The REPRODUCIBILITY form: pin the store's batch frontier with
      // snapshot("train") after two slices, then keep maintaining the
      // store — a third slice lands AND a consolidation retires a
      // pinned batch into a consol table — and read AS OF the pin.
      // The as-of resolution must ignore the later slice and substitute
      // the consolidation for its retired source (cells sum, so the
      // merged table IS the source); the oracle is GROUP BY HAVING over
      // exactly the pinned slices, so a resolution that leaks the later
      // batch, loses the consolidated one, or double-counts it
      // hash-mismatches.
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-asof-q")
      deleteRecursivelyOnExit(base)
      val docs = Tables.documents(spark, dir)
      val out = s"$base/store"
      def slice(lo: Int, hi: Int, p: String): String = {
        bigrams(docs.filter($"doc_id" >= lo && $"doc_id" < hi))
          .write.mode("overwrite").parquet(p); p
      }
      // overlap the independent slice stagings (guide §2.6); the
      // lifecycle tail stays strictly ordered — the snapshot must pin
      // exactly {base, h1}, so h2 cannot land before it
      graft.jobs.Overlap.all(
        () => slice(0, 200, s"$base/h0"): Unit,
        () => slice(200, 350, s"$base/h1"): Unit,
        () => slice(350, Int.MaxValue, s"$base/h2"): Unit)
      graft.jobs.BuildSketchStore.run(spark, s"$base/h0", out)
      graft.jobs.BuildSketchStore.append(spark, s"$base/h1", out, "h1")
      graft.jobs.BuildSketchStore.snapshot(spark, out, "train"): Unit
      graft.jobs.BuildSketchStore.append(spark, s"$base/h2", out, "h2")
      graft.jobs.BuildSketchStore.consolidate(spark, out, Seq("h1"))
      graft.jobs.BuildSketchStore.heavyHitters(spark, out,
          bigrams(docs.filter($"doc_id" < 350)), threshold = 20L,
          asOf = Some("train"))
        .orderBy($"n_occurrences".desc, $"item")
    },

    "heavy_hitters_retracted" -> { (spark, dir) =>
      // The takedown form: Count-Min counters are LINEAR, so retracting
      // the deleted docs' occurrence stream (one negated fold — no
      // history re-scan) leaves exactly the remaining stream's
      // counters, and the heavy hitters over the remaining stream are
      // exact. The oracle is GROUP BY HAVING over surviving docs only —
      // a leaky retraction (wrong sign, double-count, partial fold)
      // changes survivors' estimates and hash-mismatches.
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-retract-q")
      val docs = Tables.documents(spark, dir)
      val all = s"$base/all"; val deleted = s"$base/deleted"
      // two independent staging writes — overlap them (guide §2.6)
      graft.jobs.Overlap.all(
        () => bigrams(docs).write.mode("overwrite").parquet(all),
        () => bigrams(docs.filter($"doc_id" % 5 === 0))
          .write.mode("overwrite").parquet(deleted))
      val out = s"$base/store"
      graft.jobs.BuildSketchStore.run(spark, all, out)
      graft.jobs.BuildSketchStore.retract(spark, deleted, out, "takedown")
      graft.jobs.BuildSketchStore.heavyHitters(spark, out,
          bigrams(docs.filter($"doc_id" % 5 =!= 0)), threshold = 30L)
        .orderBy($"n_occurrences".desc, $"item")
    },

    "grouped_quantiles" -> { (spark, dir) =>
      // Per-LANGUAGE quantile bounds without any corpus sort: one
      // grouped histogram fold, then the cumulative rank walk windows
      // over each group's ≤ range/width histogram rows — groups spread
      // across tasks (the global form's single-partition window is
      // what this lifts). Median and p90 of document length per lang,
      // integer-exact bounds with error < 50 chars.
      import spark.implicits._
      import graft.ops.Sketches
      val hist = Sketches.groupedBucketHistogram(
        Tables.documents(spark, dir), "n_chars", 50L, Seq("lang"))
      Sketches.groupedBucketedQuantiles(hist, 50L,
          Seq((1, 2), (9, 10)), Seq("lang"))
        .orderBy($"lang", $"q_den", $"q_num")
    },

    "cms_join_size" -> { (spark, dir) =>
      // Optimizer-statistics from sketches: the CMS inner product
      // estimates an equi-join's cardinality from two d×w summaries —
      // here the events self-join on user_id (Σ c(u)², the skew probe
      // an optimizer actually wants) at width 4096, next to the exact
      // answer. Per-row dot products never undercount (collisions only
      // add), min over d rows; both engines run the identical integer
      // arithmetic, so the ESTIMATE itself is cross-engine pinned, not
      // just bounded.
      import spark.implicits._
      val users = Tables.events(spark, dir)
        .select($"user_id".cast("string").as("item"))
      val c = graft.ops.Sketches.cmsCounters(users, width = 4096)
      val est = graft.ops.Sketches.cmsJoinSize(c, c, width = 4096)
      val exact = users.groupBy($"item").count()
        .agg(sum($"count" * $"count").cast("long").as("exact_join_size"))
      est.crossJoin(exact)
    },

    "cms_token_estimates" -> { (spark, dir) =>
      // The sketch ITSELF, cross-engine pinned: every distinct bigram's
      // CMS estimate next to its true count (est >= n_true always —
      // OpsSpec asserts it; the oracle recomputes the identical d x w
      // counter table from the same md5 buckets). Top 30 by estimate =
      // the most collision-inflated cells first.
      import spark.implicits._
      val items = bigrams(Tables.documents(spark, dir))
      Sketches.cmsEstimates(items, Sketches.cmsCounters(items))
        .orderBy($"est".desc, $"item")
        .limit(30)
    })

  val oracles: Map[String, String] = Map(
    "inverted_postings" ->
      """SELECT token, doc_id, count(*) AS tf
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents WHERE doc_id < 40)
        |GROUP BY token, doc_id ORDER BY token, doc_id""".stripMargin,

    "ranked_search" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
         |stats AS (SELECT count(*) AS n_docs,
         |                 (1000 * sum(len(s))) // count(*) AS avgdl_milli FROM toks),
         |post AS (SELECT doc_id, dl, token, count(*) AS tf
         |         FROM (SELECT doc_id, len(s) AS dl, unnest(s) AS token FROM toks)
         |         WHERE token IN (${Terms.map(t => s"'$t'").mkString(", ")})
         |         GROUP BY 1, 2, 3),
         |dfreq AS (SELECT token, count(*) AS df FROM post GROUP BY 1)
         |SELECT doc_id,
         |       sum(((1000000 * (n_docs - df + 1)) // (n_docs + 1)) *
         |           ((22000000000 * tf) //
         |            (10000 * tf + 3000 + (9000000 * dl) // avgdl_milli)))::BIGINT AS score_pico,
         |       count(*)::BIGINT AS n_terms_hit
         |FROM post JOIN dfreq USING (token) CROSS JOIN stats
         |GROUP BY doc_id
         |ORDER BY score_pico DESC, doc_id
         |LIMIT 20""".stripMargin,

    "ranked_search_stored" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s FROM documents),
        |stats AS (SELECT count(*) AS n_docs,
        |                 (1000 * sum(len(s))) // count(*) AS avgdl_milli FROM toks),
        |post AS (SELECT doc_id, dl, token, count(*) AS tf
        |         FROM (SELECT doc_id, len(s) AS dl, unnest(s) AS token FROM toks)
        |         WHERE token IN ('hash', 'scan', 'stream')
        |         GROUP BY 1, 2, 3),
        |dfreq AS (SELECT token, count(*) AS df FROM post GROUP BY 1)
        |SELECT doc_id,
        |       sum(((1000000 * (n_docs - df + 1)) // (n_docs + 1)) *
        |           ((22000000000 * tf) //
        |            (10000 * tf + 3000 + (9000000 * dl) // avgdl_milli)))::BIGINT AS score_pico,
        |       count(*)::BIGINT AS n_terms_hit
        |FROM post JOIN dfreq USING (token) CROSS JOIN stats
        |GROUP BY doc_id
        |ORDER BY score_pico DESC, doc_id
        |LIMIT 15""".stripMargin,

    "boolean_search" ->
      """WITH p AS (SELECT doc_id, token, count(*) AS tf
        |           FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
        |           WHERE token IN ('join', 'vector', 'spark')
        |           GROUP BY 1, 2)
        |SELECT doc_id, sum(CASE WHEN token IN ('join', 'vector') THEN tf ELSE 0 END)::BIGINT AS tf_sum
        |FROM p GROUP BY doc_id
        |HAVING count(CASE WHEN token IN ('join', 'vector') THEN 1 END) = 2
        |   AND count(CASE WHEN token = 'spark' THEN 1 END) = 0
        |ORDER BY doc_id""".stripMargin,

    "phrase_search" ->
      """WITH tk AS (SELECT doc_id, generate_subscripts(s, 1) AS pos, unnest(s) AS tok
        |            FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents))
        |SELECT a.doc_id, (a.pos - 1)::INTEGER AS start_pos
        |FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
        |WHERE a.tok = 'join' AND b.tok = 'hash'
        |ORDER BY a.doc_id, start_pos""".stripMargin,

    "proximity_search" ->
      """WITH tk AS (SELECT doc_id, generate_subscripts(s, 1) AS pos, unnest(s) AS tok
        |            FROM (SELECT doc_id, string_split(text, ' ') AS s FROM documents))
        |SELECT a.doc_id, count(*) AS n_pairs, min(abs(a.pos - b.pos))::BIGINT AS min_dist
        |FROM tk a JOIN tk b ON a.doc_id = b.doc_id
        |WHERE a.tok = 'data' AND b.tok = 'vector' AND abs(a.pos - b.pos) <= 3
        |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin,

    "passage_pull" ->
      """WITH t AS (SELECT doc_id, s, len(s) AS dl,
        |                  generate_subscripts(s, 1) - 1 AS pos, unnest(s) AS token
        |           FROM (SELECT doc_id, string_split(text, ' ') AS s
        |                 FROM documents WHERE doc_id < 50))
        |SELECT doc_id, pos::INTEGER AS center,
        |       array_to_string(s[greatest(pos - 3, 0) + 1 : least(pos + 3, dl - 1) + 1], ' ') AS passage
        |FROM t WHERE token = 'vector'
        |ORDER BY doc_id, center""".stripMargin,

    "heavy_hitters_cms" ->
      s"""WITH $BigramCte
         |SELECT item, count(*) AS n_occurrences
         |FROM b GROUP BY item
         |HAVING count(*) >= greatest(1, (SELECT count(*) FROM b) // 1024)
         |ORDER BY n_occurrences DESC, item""".stripMargin,

    "heavy_hitters_merged" ->
      s"""WITH $BigramCte
         |SELECT item, count(*) AS n_occurrences
         |FROM b GROUP BY item
         |HAVING count(*) >= 40
         |ORDER BY n_occurrences DESC, item""".stripMargin,

    "ranked_search_deleted" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS s
        |              FROM documents WHERE doc_id % 5 <> 0),
        |stats AS (SELECT count(*) AS n_docs,
        |                 (1000 * sum(len(s))) // count(*) AS avgdl_milli FROM toks),
        |post AS (SELECT doc_id, dl, token, count(*) AS tf
        |         FROM (SELECT doc_id, len(s) AS dl, unnest(s) AS token FROM toks)
        |         WHERE token IN ('hash', 'scan', 'stream')
        |         GROUP BY 1, 2, 3),
        |dfreq AS (SELECT token, count(*) AS df FROM post GROUP BY 1)
        |SELECT doc_id,
        |       sum(((1000000 * (n_docs - df + 1)) // (n_docs + 1)) *
        |           ((22000000000 * tf) //
        |            (10000 * tf + 3000 + (9000000 * dl) // avgdl_milli)))::BIGINT AS score_pico,
        |       count(*)::BIGINT AS n_terms_hit
        |FROM post JOIN dfreq USING (token) CROSS JOIN stats
        |GROUP BY doc_id
        |ORDER BY score_pico DESC, doc_id
        |LIMIT 15""".stripMargin,

    "heavy_hitters_stored" ->
      s"""WITH $BigramCte
         |SELECT item, count(*) AS n_occurrences
         |FROM b GROUP BY item
         |HAVING count(*) >= 35
         |ORDER BY n_occurrences DESC, item""".stripMargin,

    // the pinned frontier = the first two slices only
    "heavy_hitters_asof" ->
      """WITH b AS (SELECT unnest([s[k] || ' ' || s[k+1] for k in range(1, len(s))]) AS item
        |           FROM (SELECT string_split(text, ' ') AS s FROM documents
        |                 WHERE doc_id < 350))
        |SELECT item, count(*) AS n_occurrences
        |FROM b GROUP BY item
        |HAVING count(*) >= 20
        |ORDER BY n_occurrences DESC, item""".stripMargin,

    "heavy_hitters_retracted" ->
      """WITH b AS (SELECT unnest([s[k] || ' ' || s[k+1] for k in range(1, len(s))]) AS item
        |           FROM (SELECT string_split(text, ' ') AS s FROM documents
        |                 WHERE doc_id % 5 <> 0))
        |SELECT item, count(*) AS n_occurrences
        |FROM b GROUP BY item
        |HAVING count(*) >= 30
        |ORDER BY n_occurrences DESC, item""".stripMargin,

    "grouped_quantiles" ->
      """WITH h AS (SELECT lang, n_chars // 50 AS bucket, count(*) AS cnt
        |           FROM documents GROUP BY 1, 2),
        |c AS (SELECT lang, bucket, cnt,
        |             sum(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS cum
        |      FROM h),
        |n AS (SELECT lang, sum(cnt) AS n_total FROM h GROUP BY 1),
        |t AS (SELECT lang, q_num, q_den, n_total,
        |             (q_num * n_total + q_den - 1) // q_den AS rank
        |      FROM n CROSS JOIN (VALUES (1, 2), (9, 10)) v(q_num, q_den))
        |SELECT t.lang, q_num, q_den, n_total::BIGINT AS n_total,
        |       rank::BIGINT AS rank, bucket,
        |       (bucket * 50)::BIGINT AS lo, (bucket * 50 + 49)::BIGINT AS hi
        |FROM t JOIN c ON c.lang = t.lang
        |   AND (c.cum - c.cnt) < t.rank AND t.rank <= c.cum
        |ORDER BY t.lang, q_den, q_num""".stripMargin,

    "cms_join_size" ->
      """WITH u AS (SELECT user_id::VARCHAR AS item FROM events),
        |c AS (SELECT r, ('0x' || substr(md5('cms' || r || ':' || item), 1, 15))::BIGINT % 4096 AS bucket,
        |             count(*) AS cnt
        |      FROM u CROSS JOIN (SELECT unnest(range(3)) AS r)
        |      GROUP BY 1, 2),
        |d AS (SELECT r, sum((cnt::HUGEINT) * cnt) AS dot FROM c GROUP BY r),
        |e AS (SELECT min(dot)::BIGINT AS est_join_size FROM d),
        |x AS (SELECT sum((n::HUGEINT) * n)::BIGINT AS exact_join_size
        |      FROM (SELECT count(*) AS n FROM u GROUP BY item))
        |SELECT est_join_size, exact_join_size FROM e CROSS JOIN x""".stripMargin,

    "cms_token_estimates" ->
      s"""WITH $BigramCte,
         |c AS (SELECT r, ('0x' || substr(md5('cms' || r || ':' || item), 1, 15))::BIGINT % 256 AS bucket,
         |             count(*) AS cnt
         |      FROM b CROSS JOIN (SELECT unnest(range(3)) AS r)
         |      GROUP BY 1, 2),
         |e AS (SELECT item, count(*) AS n_true FROM b GROUP BY 1)
         |SELECT item, min(cnt)::BIGINT AS est, n_true
         |FROM e JOIN c ON c.bucket = ('0x' || substr(md5('cms' || c.r || ':' || item), 1, 15))::BIGINT % 256
         |GROUP BY item, n_true
         |ORDER BY est DESC, item
         |LIMIT 30""".stripMargin)
}
