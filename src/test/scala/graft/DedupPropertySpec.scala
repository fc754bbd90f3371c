package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ext.{Dedup, TextOps}

/** Property test for the LSH-candidate verification path
  * (Dedup.jaccardVerify via minhashDup): on random corpora with planted
  * near-duplicates, the emitted pair set — values included — must be
  * IDENTICAL to a driver-side brute-force exact Jaccard >= threshold
  * reference restricted to the same LSH candidate pairs. Guards the
  * semi-join + shuffle-hash verify rewrite against regressions the
  * fixed fixture can't catch (e.g. a join dropping pairs, a stale
  * array attach, intersect miscounts).
  */
class DedupPropertySpec extends SparkSpec {

  private val threshold = 0.5

  private def forSamples[T](g: Gen[T], n: Int)(body: T => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(body)

  private val vocab = Vector(
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november")

  private val docGen: Gen[Seq[String]] = for {
    len <- Gen.choose(4, 18) // includes docs too short to shingle at n=3
    ws <- Gen.listOfN(len, Gen.oneOf(vocab))
  } yield ws

  // base docs plus, per base, optionally an exact or one-word-mutated
  // copy — dense near-dup structure so candidates and survivors both
  // occur at every sample size
  private val corpusGen: Gen[Seq[String]] = for {
    n <- Gen.choose(6, 12)
    bases <- Gen.listOfN(n, docGen)
    flags <- Gen.listOfN(n, Gen.choose(0, 2))
    idxs <- Gen.listOfN(n, Gen.choose(0, 1000))
    words <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield {
    val dups = bases.lazyZip(flags).lazyZip(idxs).lazyZip(words).flatMap {
      case (b, 1, _, _) => Some(b)
      case (b, 2, i, w) => Some(b.updated(i % b.size, w))
      case _ => None
    }
    (bases ++ dups).map(_.mkString(" "))
  }

  // texts with hostile tokenization: runs of spaces, leading/trailing
  // spaces, empty strings, unicode incl. astral (non-BMP) code points —
  // where a divergence between the one-pass expressions' String.split /
  // code-unit loops and Spark's split / code-point substr would hide
  private val hostileTextGen: Gen[String] = {
    val token = Gen.oneOf(
      Gen.oneOf(vocab), Gen.const(""), Gen.const("  "),
      Gen.oneOf("héllo", "日本語", "straße", "naïve", "a-b", "x,y",
        "😀🚀", "x𝒜y")) // 😀🚀, x𝒜y
    for {
      n <- Gen.choose(0, 12)
      ts <- Gen.listOfN(n, token)
      sep <- Gen.oneOf(" ", "  ", " ")
    } yield ts.mkString(sep)
  }

  private def hasAstral(s: String): Boolean =
    s.codePoints().anyMatch(_ > 0xffff)

  private def cpNgrams(s: String, n: Int): Set[String] = {
    val cps = s.codePoints().toArray
    if (cps.length < n) Set.empty
    else (0 to cps.length - n).map(i => new String(cps, i, n)).toSet
  }

  test("one-pass expressions equal their composed twins on hostile texts") {
    import spark.implicits._
    forSamples(Gen.listOfN(60, hostileTextGen), 4) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val simA = Dedup.simhash(docs)
      val simB = Dedup.simhashViaAgg(docs)
      assert(simA.exceptAll(simB).count() == 0 &&
        simB.exceptAll(simA).count() == 0, "simhash diverged")
      val sigA = Dedup.minhashSignatures(docs)
      val sigB = Dedup.minhashSignaturesViaAgg(docs)
      assert(sigA.exceptAll(sigB).count() == 0 &&
        sigB.exceptAll(sigA).count() == 0, "minhash signatures diverged")
      // n=4: 16-bit packing — BMP docs match the string form exactly,
      // astral docs signal NULL (the caller's fallback trigger).
      // n=3: 21-bit packing — total, matches even on astral docs.
      val ng = docs.select(col("doc_id"),
        org.apache.spark.sql.functions.size(
          graft.functions.PackedCharNgrams(col("text"), 4)).as("n4p"),
        org.apache.spark.sql.functions.size(
          graft.ext.TextOps.charNgrams(col("text"), 4)).as("n4s"),
        org.apache.spark.sql.functions.size(
          graft.functions.PackedCharNgrams(col("text"), 3)).as("n3p"),
        org.apache.spark.sql.functions.size(
          graft.ext.TextOps.charNgrams(col("text"), 3)).as("n3s"))
        .collect().map(r => r.getLong(0) ->
          (r.get(1), r.get(2), r.get(3), r.get(4))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val (n4p, n4s, n3p, n3s) = ng(i.toLong)
        if (hasAstral(t)) assert(n4p == null, s"expected null for astral: '$t'")
        else assert(n4p == n4s, s"n=4 packed size diverged on '$t'")
        assert(n3p == n3s, s"n=3 packed size diverged on '$t'")
      }
      // one-pass CharWindows vs the composed transform+substr form
      // (code-point windows, so astral texts must agree too); length
      // guard mirrors repeatedPassages — sequence(1, len-4) descends
      // for shorter texts
      import org.apache.spark.sql.functions.{length => slen, lit => slit, not, sequence => sseq, transform => stransform}
      val cw = docs.filter(slen(col("text")) >= 5).select(
        graft.functions.CharWindows(col("text"), 5).as("a"),
        stransform(sseq(slit(1), slen(col("text")) - 4),
          i => col("text").substr(i, slit(5))).as("b"))
      assert(cw.filter(not(col("a") <=> col("b"))).count() == 0,
        "char windows diverged from transform+substr")
      ()
    }
  }

  test("ngramJaccardDup equals brute force on corpora with astral text") {
    import spark.implicits._
    val astralDocGen: Gen[String] = for {
      len <- Gen.choose(6, 20)
      cs <- Gen.listOfN(len, Gen.oneOf(
        Gen.alphaChar.map(_.toString), Gen.oneOf("é", "日", "😀", "𝒜", "🚀")))
    } yield cs.mkString
    val astralCorpusGen: Gen[Seq[String]] = for {
      n <- Gen.choose(8, 14)
      bases <- Gen.listOfN(n, astralDocGen)
      flags <- Gen.listOfN(n, Gen.choose(0, 2))
      ext <- Gen.listOfN(n, Gen.oneOf("a", "😀", "zz"))
    } yield bases ++ bases.lazyZip(flags).lazyZip(ext).flatMap {
      case (b, 1, _) => Some(b) // exact copy
      case (b, 2, e) => Some(b + e) // near copy
      case _ => None
    }
    val (n, maxLenDiff, thr) = (4, 10, 0.3)
    forSamples(astralCorpusGen, 4) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) =>
          (i.toLong, t, "xx", t.codePointCount(0, t.length)) }
        .toDF("doc_id", "text", "lang", "n_chars")
      val got = Dedup.ngramJaccardDup(docs, n, maxLenDiff, thr).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getDouble(3)))
        .toMap
      val byId = texts.zipWithIndex.map { case (t, i) => i.toLong -> t }.toMap
      val expected = (for {
        a <- byId.keys; b <- byId.keys
        if a < b
        if math.abs(byId(a).codePointCount(0, byId(a).length) -
          byId(b).codePointCount(0, byId(b).length)) <= maxLenDiff
        ga = cpNgrams(byId(a), n); gb = cpNgrams(byId(b), n)
        common = ga.intersect(gb).size
        denom = ga.size + gb.size - common
        if denom > 0 && common.toDouble / denom >= thr
      } yield (a, b) -> (common, common.toDouble / denom)).toMap
      assert(got == expected,
        s"got ${got.keySet} expected ${expected.keySet} corpus=$texts")
      ()
    }
  }

  test("driver union-find clusters equal the distributed label-propagation loop") {
    import spark.implicits._
    forSamples(corpusGen, 4) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val pairs = Dedup.minhashDup(docs, threshold = 0.3)
        .select(col("doc_a"), col("doc_b")).localCheckpoint()
      val viaDriver = Dedup.dupClusters(pairs).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaLoop = Dedup.dupClusters(pairs, driverThreshold = 0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDriver == viaLoop,
        s"driver ${viaDriver -- viaLoop} loop ${viaLoop -- viaDriver}")
      ()
    }
  }

  test("shaped banding nests: finer bands only widen the verified-pair set") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 300).cache()
    def pairs(b: Int, r: Int) =
      Dedup.minhashDupShaped(docs, threshold = 0.5, bands = b, rows = r)
        .select(col("doc_a"), col("doc_b")).collect()
        .map(row => (row.getLong(0), row.getLong(1))).toSet
    val p82 = pairs(8, 2); val p44 = pairs(4, 4); val p28 = pairs(2, 8)
    // an r-row band match implies both of its r/2-row halves match, so
    // candidates (and their verified subsets) nest by construction
    assert(p28.subsetOf(p44) && p44.subsetOf(p82))
    // the default shape IS the (Bands, Rows) point of the sweep
    val dflt = Dedup.minhashDup(docs, threshold = 0.5)
      .select(col("doc_a"), col("doc_b")).collect()
      .map(row => (row.getLong(0), row.getLong(1))).toSet
    assert(dflt == p44)
    docs.unpersist()
    ()
  }

  test("minhashDup equals brute-force Jaccard restricted to LSH candidates") {
    import spark.implicits._
    forSamples(corpusGen, 8) { texts =>
      val docs = texts.zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
        .cache()

      // the system under test
      val got = Dedup.minhashDup(docs, threshold).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getInt(2), r.getDouble(3)))
        .toMap

      // same candidate generation as minhashDup (public pieces) ...
      val bands = Dedup.minhashBands(Dedup.minhashSignatures(docs))
      val cand = bands.as("x").join(bands.as("y"),
          col("x.band_idx") === col("y.band_idx") &&
          col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id"), col("y.doc_id")).distinct()
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      // ... then brute-force exact verification on the driver
      val shingles = docs.select(col("doc_id"),
          TextOps.wordShingles(col("text"), Dedup.ShingleSize).as("sh"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
      val expected = cand.flatMap { case (a, b) =>
        val (sa, sb) = (shingles(a), shingles(b))
        val n = sa.intersect(sb).size
        val denom = sa.size + sb.size - n
        val j = n.toDouble / denom // same IEEE division as the Spark plan
        if (denom > 0 && j >= threshold) Some((a, b) -> ((n, j))) else None
      }.toMap

      assert(got == expected,
        s"corpus=${texts.size} docs; got ${got.keySet} expected ${expected.keySet}")
      docs.unpersist()
      ()
    }
  }
}
