package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.Dedup

/** Generated-corpus properties for the dedup pipeline: planted
  * high-overlap near-duplicates are always detected, unrelated documents
  * never are, and output pairs are canonical (a < b, no duplicates).
  * Fixed seeds keep runs reproducible.
  */
class DedupPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // a corpus of word-salad docs over a shared small vocabulary (the
  // hard case for token-level similarity), plus one planted near-dup
  private val corpusGen: Gen[(List[String], Int)] = for {
    nDocs <- Gen.choose(5, 15)
    vocab = (1 to 50).map(i => s"w$i")
    docs <- Gen.listOfN(nDocs, Gen.listOfN(60, Gen.oneOf(vocab)).map(_.mkString(" ")))
    victim <- Gen.choose(0, nDocs - 1)
    editPos <- Gen.choose(5, 50)
  } yield {
    val toks = docs(victim).split(" ").toVector
    val nearDup = toks.updated(editPos, "EDITED").mkString(" ")
    (docs :+ nearDup, victim)
  }

  test("connected components equal a driver-side union-find on random graphs") {
    val edgeGen: Gen[List[(Long, Long)]] = for {
      nNodes <- Gen.choose(4, 40)
      nEdges <- Gen.choose(1, 60)
      edges <- Gen.listOfN(nEdges, for {
        a <- Gen.choose(0L, nNodes - 1L)
        b <- Gen.choose(0L, nNodes - 1L) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges
    val samples = (1 to 6).flatMap(i => edgeGen.apply(Gen.Parameters.default, Seed(31L + i)))
    assert(samples.size >= 4)
    samples.foreach { edges =>
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // oracle: plain union-find over the same edges
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // canonicalize both sides by component-minimum
      val want = nodes.map(n => n -> n).toMap.map { case (n, _) => n -> find(n) }
      val wantMin = want.groupBy(_._2).flatMap { case (_, m) =>
        val mn = m.keys.min; m.keys.map(_ -> mn)
      }
      assert(got == wantMin, s"edges=$edges")
    }
  }

  test("pointer jumping converges on long paths in O(log d) rounds") {
    // Adversarial shape for label propagation: a single long chain whose
    // ids are SHUFFLED (so min-label flow is not aligned with edge
    // direction). maxIter is set near log2(diameter) + slack: path
    // doubling covers ≥2^k distance after k rounds, while 1-hop-only
    // propagation would need ~diameter rounds — if the pointer jump ever
    // regresses, these labels cannot converge and the assert fails.
    val chainGen: Gen[Vector[Long]] = for {
      n <- Gen.choose(150, 300)
      perm <- Gen.const(()).map(_ => new scala.util.Random(n).shuffle((1L to n).toVector))
    } yield perm
    val samples = (1 to 3).flatMap(i => chainGen.apply(Gen.Parameters.default, Seed(401L + i)))
    assert(samples.size >= 2)
    samples.foreach { ids =>
      val edges = ids.sliding(2).map(p => (math.min(p(0), p(1)), math.max(p(0), p(1)))).toSeq
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"), maxIter = 12)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      assert(got.length == ids.length)
      assert(got.forall(_._2 == 1L),
        s"n=${ids.length}: ${got.filter(_._2 != 1L).take(5).toSeq} not converged in 12 rounds")
    }
  }

  test("disjoint components never merge") {
    // Two interleaved chains over even/odd ids: the components' id
    // ranges overlap completely, so any cross-component label bleed
    // (e.g. a join key mixup) would merge them instantly.
    val n = 60L
    val evens = (0L until n by 2).toVector
    val odds = (1L until n by 2).toVector
    val edges = (evens.sliding(2) ++ odds.sliding(2)).map(p => (p(0), p(1))).toSeq
    val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    assert(got.filter(_._1 % 2 == 0).values.toSet == Set(0L))
    assert(got.filter(_._1 % 2 == 1).values.toSet == Set(1L))
  }

  test("simhash pigeonhole blocking never misses a brute-force pair") {
    val corpus: Gen[List[String]] = for {
      nDocs <- Gen.choose(8, 25)
      vocab = (1 to 30).map(i => s"w$i")
      docs <- Gen.listOfN(nDocs, Gen.listOfN(25, Gen.oneOf(vocab)).map(_.mkString(" ")))
    } yield docs
    val samples = (1 to 5).flatMap(i => corpus.apply(Gen.Parameters.default, Seed(101L + i)))
    assert(samples.size >= 3)
    samples.foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val blocked = Dedup.simhashNearDup(df)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val sims = Dedup.simhash(df).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val brute = (for {
        a <- sims.keys; b <- sims.keys if a < b
        if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= 3
      } yield (a, b)).toSet
      assert(blocked == brute)
    }
  }

  test("incremental dedup equals the full pipeline filtered to new pairs") {
    val samples = (1 to 4).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(211L + i)))
    assert(samples.size >= 3)
    samples.foreach { case (docs, _) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val split = docs.size / 2L
      val full = Dedup.minhashPairs(df)
        .filter($"doc_b" >= split)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val incr = Dedup.minhashPairsIncremental(df, split)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(incr == full, s"split=$split")
    }
  }

  test("prefix-filter jaccard join equals brute-force all-pairs on random corpora") {
    import org.apache.spark.sql.functions.{broadcast, size => asize, array_intersect}
    val samples = (1 to 4).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(31L + i)))
    assert(samples.nonEmpty)
    for ((docs, _) <- samples; (tn, td) <- Seq((3, 10), (1, 2))) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val sh = Dedup.shingleArrays(df)
      val brute = sh.select($"doc_id".as("doc_a"), $"shingles".as("sa"))
        .crossJoin(broadcast(sh.select($"doc_id".as("doc_b"), $"shingles".as("sb"))))
        .filter($"doc_a" < $"doc_b")
        .withColumn("inter", asize(array_intersect($"sa", $"sb")))
        .withColumn("uni", asize($"sa") + asize($"sb") - $"inter")
        .filter($"inter" * td > $"uni" * tn)
        .select("doc_a", "doc_b", "inter", "uni")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3))).toSet
      val prefixed = Dedup.jaccardPrefixPairs(df, tn, td)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toInt, r.getLong(3).toInt)).toSet
      assert(prefixed == brute, s"t=$tn/$td")
    }
  }

  test("prefix-filter jaccard join: identical, boundary, and disjoint sets") {
    val same = "a b c d e f g h"                     // identical pair: J = 1
    val disjoint = "p q r s t u v w"
    // boundary: 8-token docs sharing exactly half their 6 shingles →
    // inter = 3, uni = 9, J = 1/3 exactly: NOT > 1/3, excluded
    val base = "a b c d e x1 x2 x3"
    val half = "a b c d e y1 y2 y3"
    val df = Seq((1L, same), (2L, same), (3L, disjoint), (4L, base), (5L, half))
      .toDF("doc_id", "text")
    val at13 = Dedup.jaccardPrefixPairs(df, 1, 3)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at13.contains((1L, 2L)))
    assert(!at13.contains((4L, 5L)))  // exactly at threshold: strict >
    assert(!at13.exists(p => p._1 == 3L || p._2 == 3L))
    // loosen below 1/3 and the boundary pair appears
    val at14 = Dedup.jaccardPrefixPairs(df, 1, 4)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(at14.contains((4L, 5L)))
  }

  test("prefix-filter jaccard join: tiny docs below the ℓ-match overlap are still complete") {
    // r15 ℓ-extended prefixes require min(α, ℓ) matches per candidate;
    // α = ⌊(nx+ny)·t/(1+t)⌋ + 1 is BELOW ℓ = 3 for these tiny docs
    // (1–2 shingles), so the α cap — not the raw ℓ — must gate them.
    val df = Seq(
      (1L, "a b c"),            // 1 shingle; identical to 2 → J = 1
      (2L, "a b c"),
      (3L, "a b c d"),          // 2 shingles; shares 1 of 2 with 4 → J = 1/3 at den 3
      (4L, "a b c e"),
      (5L, "z y x")             // disjoint singleton
    ).toDF("doc_id", "text")
    val out = Dedup.jaccardPrefixPairs(df, 3, 10)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.contains((1L, 2L)))   // α = 1 < ℓ: one match must suffice
    assert(out.contains((3L, 4L)))   // inter=1, uni=3: J = 1/3 > 3/10
    assert(!out.exists(p => p._1 == 5L || p._2 == 5L))
    // cross-size containment-ish pair: J = 1/2 > 3/10, sizes differ
    assert(out.contains((1L, 3L)) && out.contains((2L, 3L)))
  }

  test("minhash pipeline finds every planted near-dup and only those") {
    val samples = (1 to 8).flatMap(i => corpusGen.apply(Gen.Parameters.default, Seed(7L + i)))
    assert(samples.size >= 6)
    samples.foreach { case (docs, victim) =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.minhashPairs(df)
        .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      val planted = (victim.toLong, (docs.size - 1).toLong)
      assert(pairs.contains(planted), s"missed planted pair $planted in ${pairs.toSeq}")
      // canonical form: a < b, unique
      assert(pairs.forall { case (a, b) => a < b })
      assert(pairs.distinct.length == pairs.length)
      // random 60-token salads over 50 words essentially never share
      // >50% of 3-shingles: everything found must involve the victim
      // pair or be a genuine high-overlap coincidence — verify via exact
      // jaccard recomputation that every reported pair clears threshold
      val verified = Dedup.minhashPairs(df)
        .filter($"inter" * 2 <= $"uni").count()
      assert(verified == 0)
    }
  }
}
