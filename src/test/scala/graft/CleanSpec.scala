package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.operators.Clean
import graft.schema.TmdbCorpus

/** Golden tests for the C1-C8 clean operators over the synthetic TMDB
  * corpus — the Spark twin of the reference's expected_results fixtures,
  * with the three stale-fixture landmines resolved deliberately
  * (SURVEY.md §5): missing external_ids -> NULL, full cast/crew fields,
  * exploded watch-provider tuples.
  */
class CleanSpec extends SparkTestBase {

  lazy val cleaned = Clean.movieDetails(TmdbCorpus.movies(spark)).cache()

  test("C1: scalar projection + null conventions") {
    val rows = cleaned.select("movie_id", "collection_id", "overview",
        "budget", "revenue", "runtime", "popularity", "wiki_id")
      .collect().map(r => r.getLong(0) -> r).toMap
    val m101 = rows(101L)
    assert(m101.getLong(1) == 900L)
    assert(m101.getString(7) == "Q9100001")
    val m102 = rows(102L)
    assert(m102.isNullAt(1), "null collection struct -> null id")
    assert(m102.isNullAt(2), "empty overview -> null")
    assert(m102.isNullAt(3) && m102.isNullAt(4) && m102.isNullAt(5), "0 -> null")
    assert(m102.isNullAt(6), "popularity 0.0 -> null")
    assert(m102.isNullAt(7), "ABSENT external_ids -> null wiki_id (not an error)")
    val m103 = rows(103L)
    assert(m103.isNullAt(7), "empty wikidata_id string -> null")
    assert(m103.getLong(3) == 120000L)
  }

  test("C1: nested array projections and gender decode inside arrays") {
    val m101 = cleaned.filter(col("movie_id") === 101).collect().head
    assert(m101.getAs[scala.collection.Seq[Long]]("genres") == Seq(18L, 878L))
    assert(m101.getAs[scala.collection.Seq[Long]]("production_companies") == Seq(10L, 21L))
    assert(m101.getAs[scala.collection.Seq[String]]("spoken_languages") == Seq("en", "fr"))
    assert(m101.getAs[scala.collection.Seq[String]]("production_countries") == Seq("US", "GB"))
    val casts = m101.getAs[scala.collection.Seq[Row]]("casts")
    assert(casts.map(_.getAs[Long]("person_id")) == Seq(5001L, 5002L))
    assert(casts.head.getAs[String]("gender") == "Female")
    assert(casts.head.getAs[String]("character") == "Ila Voss")
    val crews = m101.getAs[scala.collection.Seq[Row]]("crews")
    assert(crews.map(_.getAs[String]("department")) == Seq("Directing", "Writing", "Sound"))
    // unknown gender enum 7 -> NULL, the documented drift-tolerant divergence
    assert(crews.last.getAs[String]("gender") == null)
  }

  test("C1: empty-array movie yields empty arrays, not nulls") {
    val m103 = cleaned.filter(col("movie_id") === 103).collect().head
    assert(m103.getAs[scala.collection.Seq[Long]]("genres").isEmpty)
    assert(m103.getAs[scala.collection.Seq[Row]]("casts").isEmpty)
  }

  test("C2/C3/C4: collection, company, person projections") {
    val coll = Clean.collectionDetails(TmdbCorpus.collections(spark))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(coll(900L).getString(1) == "Harbor Saga")
    assert(coll(901L).isNullAt(2), "empty overview -> null")

    val comp = Clean.companyDetails(TmdbCorpus.companies(spark))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(comp(21L).getLong(1) == 20L)
    assert(comp(10L).isNullAt(1), "null parent struct -> null parent id")
    assert(comp(30L).isNullAt(4) && comp(30L).isNullAt(5), "empty strings -> null")
    assert(comp(21L).getString(4) == "GB")

    val pers = Clean.personDetails(TmdbCorpus.persons(spark))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(pers(5001L).getString(2) == "Female")
    assert(pers(5003L).getString(2) == "Not specified")
    assert(pers(5003L).isNullAt(3) && pers(5003L).isNullAt(4), "empty bio/place -> null")
    assert(pers(5003L).isNullAt(7), "popularity 0 -> null")
  }

  test("C7: bridges explode with empty arrays contributing nothing") {
    val genres = Clean.genreBridge(cleaned).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(genres == Set((101L, 18L), (101L, 878L), (102L, 35L)))
    assert(Clean.languageBridge(cleaned).count() == 3) // 101:en,fr 102:fr
  }

  test("C8: watch-provider inversion to (movie, region, provider, type)") {
    val offers = Clean.watchProviderOffers(cleaned).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSet
    assert(offers == Set(
      (101L, "US", 2L, "buy"), (101L, "US", 2L, "rent"), (101L, "US", 8L, "subscription"),
      (101L, "FR", 3L, "rent"), (101L, "FR", 8L, "subscription"),
      (102L, "FR", 3L, "buy")))
    // flatrate renamed to subscription; empty arrays pruned by explode
    val regrouped = Clean.watchProvidersRegrouped(cleaned)
      .filter(col("provider_id") === 8 && col("type") === "subscription" && col("movie_id") === 101)
      .collect().head
    assert(regrouped.getAs[scala.collection.Seq[String]]("regions") == Seq("FR", "US"))
  }

  test("cast/crew explode + person dim union dedup") {
    val crew = Clean.crewExplode(cleaned)
    assert(crew.filter(col("rel_type") === "DIRECTED_BY").count() == 1)
    assert(crew.filter(col("rel_type") === "SOUND_BY").count() == 1)
    // empty job string -> null role prop (omitted-when-empty semantics)
    assert(crew.filter(col("person_id") === 6003).collect().head.isNullAt(4))
    val dim = Clean.personDim(cleaned)
    assert(dim.count() == dim.select("person_id").distinct().count())
    assert(dim.count() == 7) // 5001,5002,5003 cast + 6001-6004 crew
  }
}
