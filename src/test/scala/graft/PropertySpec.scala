package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.{forAll, propBoolean}
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{SparkSession, functions => F}
import graft.operators._

/** Property-based tests (ScalaCheck) for the pipeline kernels whose
  * correctness is an algebraic invariant rather than a fixed expected
  * value — randomized inputs probe edge shapes the example-based specs
  * don't enumerate. Driver-side kernels are tested pure; the two
  * DataFrame properties reuse one local session.
  */
class PropertySpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-property-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  private def check(prop: Prop): Unit = {
    val r = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(r.passed, r.status.toString)
  }

  private val wordGen: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.take(6).mkString)
  private val textGen: Gen[String] =
    Gen.listOf(wordGen).map(_.mkString(" "))

  test("positionalNgrams: count, positions, and reconstruction invariants") {
    check(forAll(textGen, Gen.choose(1, 6)) { (text, n) =>
      val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val grams = graft.operators.PropertyAccess.positionalNgrams(text, n)
      val expectedCount = math.max(0, toks.length - n + 1)
      grams.length == expectedCount &&
        grams.zipWithIndex.forall { case ((pos, g), i) =>
          pos == i && g == toks.slice(i, i + n).mkString(" ")
        }
    })
  }

  test("SpaceSaving reduce/merge: safe overcount and heavy-hitter survival") {
    val streamGen = Gen.listOf(Gen.choose(0, 9).map(i => s"k$i"))
    check(forAll(streamGen, Gen.choose(1, 12), Gen.choose(1, 4)) { (xs, k, parts) =>
      val ss = new graft.functions.SpaceSaving(k)
      // split the stream into partials, reduce each, then fold merges —
      // the exact dataflow Spark's partial aggregation performs
      val partials = xs.grouped(math.max(1, (xs.size + parts - 1) / parts))
        .map(_.foldLeft(ss.zero)(ss.reduce)).toList
      val merged = partials.foldLeft(ss.zero)(ss.merge)
      val truth = xs.groupBy(identity).map { case (kk, v) => kk -> v.size.toLong }
      val out = ss.finish(merged)
      val safe = out.forall { case (kk, est, err) =>
        val t = truth.getOrElse(kk, 0L)
        est >= t && est - err <= t
      }
      val n = xs.size.toLong
      val hitters = truth.filter { case (_, c) => c > n / k }
      val survive = hitters.keys.forall(kk => out.exists(_._1 == kk))
      (xs.isEmpty || (safe && survive)) :| s"out=$out truth=$truth k=$k"
    })
  }

  test("packSequences: offsets are a prefix sum, spans cover token counts") {
    import spark.implicits._
    check(forAll(
      Gen.listOf(Gen.choose(0L, 3000L)).map(_.take(40)),
      Gen.choose(1L, 2048L)) { (counts, cap) =>
      val df = counts.zipWithIndex.map { case (c, i) => (i.toLong, c) }
        .toDF("doc_id", "n_tokens")
      val out = Packing.packSequences(df, "doc_id", "n_tokens", cap)
        .orderBy("id").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      val offsets = counts.scanLeft(0L)(_ + _)
      out.zipWithIndex.forall { case ((nt, off, first, last, nseq), i) =>
        nt == counts(i) && off == offsets(i) &&
          first == off / cap &&
          last == (if (nt == 0) first else (off + nt - 1) / cap) &&
          nseq == last - first + 1
      } :| s"cap=$cap counts=$counts"
    })
  }

  test("domainMixSample: survivors subset input, ratios within buckets tolerance") {
    import spark.implicits._
    check(forAll(Gen.choose(20, 200), Gen.choose(20, 200)) { (na, nb) =>
      val rows = (0 until na).map(i => (i.toLong, "a")) ++
        (na until na + nb).map(i => (i.toLong, "b"))
      val df = rows.toDF("id", "lang")
      val out = Sampling.domainMixSample(df, "lang", "id",
        Map("a" -> 1L, "b" -> 1L), buckets = 1000)
        .collect().map(r => (r.getLong(0), r.getString(1)))
      val ids = rows.toMap
      val subset = out.forall { case (id, lang) => ids.get(id).contains(lang) }
      // target 1:1 from K = min(na, nb): each domain keeps ~K rows; the
      // md5-bucket filter is binomial around the threshold, so allow a
      // generous tolerance band
      val k = math.min(na, nb)
      val byLang = out.groupBy(_._2).map { case (l, v) => l -> v.size }
      // the md5-bucket filter is binomial(n_domain, thr/buckets) with
      // mean ~k — band at 4.5 sigma so 60 random trials per run stay
      // reliably green (k/2 was ~0.5% flaky at small k)
      val inBand = Seq("a", "b").forall { l =>
        val kept = byLang.getOrElse(l, 0)
        kept >= k - 4.5 * math.sqrt(k.toDouble) - 1 &&
          kept <= k + 4.5 * math.sqrt(k.toDouble) + 1
      }
      (subset && inBand) :| s"na=$na nb=$nb byLang=$byLang"
    })
  }

  test("SparkEntry maps: no duplicate keys, every oracle has a query") {
    // Scala Map literals dedup silently — a reused key SHADOWS the
    // earlier query/oracle with no warning (q_cuped, round 11). The
    // maps can't reveal it, so this audits the SOURCE.
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      "UTF-8")
    val entry = """"((?:q_|fit_)[a-z0-9_]+)" ->""".r
    val all = entry.findAllMatchIn(src).toSeq
    val (qs, os) = all.partition(m =>
      src.substring(m.end).trim.startsWith("(("))
    def dups(keys: Seq[String]) =
      keys.groupBy(identity).collect { case (k, v) if v.size > 1 => k }
    val qKeys = qs.map(_.group(1))
    val oKeys = os.map(_.group(1))
    assert(dups(qKeys).isEmpty,
      s"duplicate queries-map keys: ${dups(qKeys)}")
    assert(dups(oKeys).isEmpty,
      s"duplicate oracleSql-map keys: ${dups(oKeys)}")
    // an oracle without a query is a dead key (typo'd name)
    val orphans = oKeys.toSet -- qKeys.toSet
    assert(orphans.isEmpty, s"oracles with no matching query: $orphans")
    // and the regex really sees the maps (sanity floor)
    assert(qKeys.size > 400 && oKeys.size > 400,
      s"source audit regex broke: ${qKeys.size}/${oKeys.size}")
    // the runtime maps agree with the source census
    assert(SparkEntry.queries.size == qKeys.distinct.size,
      s"queries map ${SparkEntry.queries.size} vs source ${qKeys.distinct.size}")
    assert(SparkEntry.oracleSql.size == oKeys.distinct.size,
      s"oracleSql map ${SparkEntry.oracleSql.size} vs source ${oKeys.distinct.size}")
  }
}
