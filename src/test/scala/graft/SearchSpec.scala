package graft

import org.apache.spark.sql.functions._

/** Driver-side replay pins for the retrieval re-ranking family
  * (q_search_mmr; q_search_hybrid is pinned in PlanSpec + the oracle). */
class SearchSpec extends SparkSpec {

  test("q_search_mmr replays the greedy λ=0.7 selection exactly; picks " +
    "are distinct and rank 1 is the pure relevance argmax") {
    val got = SparkEntry.queries("q_search_mmr")(spark, sfDir).collect()
      .map(r => (r.getInt(r.fieldIndex("pick_rank")),
        r.getLong(r.fieldIndex("doc_id")),
        r.getLong(r.fieldIndex("rel_u")),
        r.getLong(r.fieldIndex("red_u")),
        r.getLong(r.fieldIndex("score"))))
      .sortBy(_._1).toList
    assert(got.map(_._1) == (1 to 5).toList)
    assert(got.map(_._2).distinct.length == 5)
    // independent replay from the raw embeddings with the same fold
    // order as graft_cosine (cosine is IEEE-symmetric: the dot's
    // element products commute termwise and ‖a‖²·‖b‖² commutes under
    // the single sqrt, so sim(s, c) = sim(c, s) bitwise)
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val q = e.find(_._1 == 0L).get._2
    def cosU(a: Array[Float], b: Array[Float]): Long = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      math.floor(dot / math.sqrt(na * nb) * 1000000.0 + 0.5).toLong
    }
    val cand = e.filter(_._1 != 0L)
      .map { case (id, v) => (id, v, cosU(q, v)) }
      .sortBy(c => (-c._3, c._1)).take(20)
    val byId = cand.map(c => c._1 -> c).toMap
    var sel = List.empty[(Int, Long, Long, Long, Long)]
    for (r <- 1 to 5) {
      val picked = sel.map(_._2).toSet
      val best = cand.filter(c => !picked(c._1)).map { c =>
        val red = if (sel.isEmpty) 0L
        else sel.map(s => cosU(byId(s._2)._2, c._2)).max
        (c._1, c._3, red, 7 * c._3 - 3 * red)
      }.minBy(x => (-x._4, x._1))
      sel :+= ((r, best._1, best._2, best._3, best._4))
    }
    assert(got == sel, s"engine $got vs replay $sel")
    // the re-ranker must actually diversify on this fixture: at least
    // one pick differs from the pure top-5-by-relevance head
    val topRel = cand.take(5).map(_._1).toSet
    assert(got.map(_._2).toSet != topRel ||
      got.exists(_._4 > 0), "MMR degenerated to pure relevance")
  }
}
