package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions._

/** Projection / cleaning operators (SURVEY.md §2.2, C1-C8): each reference
  * `clean_*` task re-expressed as a single declarative transform — wide
  * `select`s with nested-field access, `transform` over arrays, `explode`
  * bridges, and one group-and-collect inversion. All built-in expressions;
  * the only shuffle in this file is C8's regroup aggregation.
  */
object Clean {

  /** C1 clean_movie_details (/root/reference/src/movie_etl/tasks/etl_task.py:146-203).
    * One wide select, no shuffle. Divergence from reference (documented):
    * a missing `external_ids` yields NULL wiki_id instead of a KeyError
    * (SURVEY.md §5 landmine #1); unknown gender enums decode to NULL.
    */
  def movieDetails(movies: DataFrame): DataFrame = movies.select(
    col("belongs_to_collection.id").as("collection_id"),
    col("id").as("movie_id"),
    col("title"),
    nullIfEmpty(col("overview")).as("overview"),
    to_date(col("release_date")).as("release_date"),
    nullif(col("popularity"), lit(0d)).as("popularity"),
    nullif(col("budget"), lit(0L)).as("budget"),
    nullif(col("revenue"), lit(0L)).as("revenue"),
    nullIfZero(col("runtime")).as("runtime"),
    nullIfEmpty(col("external_ids.wikidata_id")).as("wiki_id"),
    transform(col("production_countries"), c => c.getField("iso_3166_1")).as("production_countries"),
    transform(col("genres"), g => g.getField("id")).as("genres"),
    transform(col("credits.cast"), c => struct(
      c.getField("id").as("person_id"),
      c.getField("name").as("name"),
      decodeGender(c.getField("gender")).as("gender"),
      c.getField("character").as("character"))).as("casts"),
    transform(col("credits.crew"), c => struct(
      c.getField("id").as("person_id"),
      c.getField("name").as("name"),
      decodeGender(c.getField("gender")).as("gender"),
      c.getField("job").as("job"),
      c.getField("department").as("department"))).as("crews"),
    transform(col("production_companies"), c => c.getField("id")).as("production_companies"),
    transform(col("spoken_languages"), l => l.getField("iso_639_1")).as("spoken_languages"),
    col("watch_providers"))

  /** C2 clean_collection_details (etl_task.py:205-219). */
  def collectionDetails(collections: DataFrame): DataFrame = collections.select(
    col("id").as("collection_id"),
    col("name"),
    nullIfEmpty(col("overview")).as("overview"))

  /** C3 clean_company_details (etl_task.py:221-238). */
  def companyDetails(companies: DataFrame): DataFrame = companies.select(
    col("id").as("company_id"),
    col("parent_company.id").as("parent_company_id"),
    col("name"),
    nullIfEmpty(col("description")).as("description"),
    nullIfEmpty(col("origin_country")).as("country_id"),
    nullIfEmpty(col("headquarters")).as("head_quarters"))

  /** C4 clean_person_details (etl_task.py:240-259). */
  def personDetails(persons: DataFrame): DataFrame = persons.select(
    col("id").as("person_id"),
    col("name"),
    decodeGender(col("gender")).as("gender"),
    nullIfEmpty(col("biography")).as("biography"),
    nullIfEmpty(col("place_of_birth")).as("place_of_birth"),
    nullIfEmpty(col("birthday")).as("birthday"),
    nullIfEmpty(col("deathday")).as("deathday"),
    nullif(col("popularity"), lit(0d)).as("popularity"))

  /** C7 clean_genres / clean_languages / clean_production_countries
    * (etl_task.py:287-327): zip movie_id with each array element — the
    * canonical explode bridge. `explode` (not _outer): a movie with an
    * empty array contributes no bridge rows, matching the reference's
    * empty-branch guards (etl_flow.py:552-565).
    */
  def bridge(cleaned: DataFrame, arrayCol: String, idCol: String): DataFrame =
    cleaned.select(col("movie_id"), explode(col(arrayCol)).as(idCol))

  def genreBridge(cleaned: DataFrame): DataFrame = bridge(cleaned, "genres", "genre_id")
  def languageBridge(cleaned: DataFrame): DataFrame = bridge(cleaned, "spoken_languages", "language_id")
  def countryBridge(cleaned: DataFrame): DataFrame = bridge(cleaned, "production_countries", "country_id")

  /** Cast / crew explode feeding the Person dim and the ACTED_IN / crew
    * edges (etl_flow.py:425-531). Crew rows carry the routed relationship
    * type as a derived column (one plan, 11 logical edge types — not 11
    * physical plans).
    */
  def castExplode(cleaned: DataFrame): DataFrame =
    cleaned.select(col("movie_id"), explode(col("casts")).as("c")).select(
      col("movie_id"), col("c.person_id").as("person_id"), col("c.name").as("name"),
      col("c.gender").as("gender"), nullIfEmpty(col("c.character")).as("role"))

  def crewExplode(cleaned: DataFrame): DataFrame =
    cleaned.select(col("movie_id"), explode(col("crews")).as("c")).select(
      col("movie_id"), col("c.person_id").as("person_id"), col("c.name").as("name"),
      col("c.gender").as("gender"), nullIfEmpty(col("c.job")).as("job"),
      departmentToRelType(col("c.department")).as("rel_type"))

  /** Person dimension = cast union crew, first-write-wins dedup
    * (etl_flow.py:439-448 vs 493-502; SURVEY.md §2.6 set-ops row).
    */
  def personDim(cleaned: DataFrame): DataFrame = {
    val fromCast = castExplode(cleaned).select("person_id", "name", "gender")
    val fromCrew = crewExplode(cleaned).select("person_id", "name", "gender")
    fromCast.unionByName(fromCrew).dropDuplicates("person_id")
  }

  /** C8 clean_watch_providers (etl_task.py:261-285) — relational form:
    * map-explode the region->offers map, unpivot the three offer arrays
    * via `stack`, explode providers. Output one row per
    * (movie_id, region, provider_id, type), type in {buy, rent,
    * subscription} (flatrate renamed). This is the exploded shape the
    * reference's own old golden used (FIXTURES.md §2) and what the edge
    * builder consumes.
    */
  def watchProviderOffers(cleaned: DataFrame): DataFrame =
    cleaned
      .select(col("movie_id"), explode(col("watch_providers.results")).as(Seq("region", "offers")))
      .select(col("movie_id"), col("region"), expr(
        "stack(3, 'buy', offers.buy, 'rent', offers.rent, 'subscription', offers.flatrate) as (type, providers)"))
      .select(col("movie_id"), col("region"), col("type"),
        explode(col("providers")).as("p"))
      .select(col("movie_id"), col("region"), col("p.provider_id").as("provider_id"), col("type"))

  /** C8 regrouped form: the reference's actual return shape —
    * provider_id -> region lists per offer type, with empty lists pruned
    * (the reference *intends* to prune at etl_task.py:281-282 but its loop
    * is a no-op; pruning actually happens downstream at etl_flow.py:87 —
    * we prune here, by construction). The one true aggregation of the
    * reference: groupBy + collect_list, map-side-combinable.
    */
  def watchProvidersRegrouped(cleaned: DataFrame): DataFrame =
    watchProviderOffers(cleaned)
      .groupBy(col("movie_id"), col("provider_id"), col("type"))
      .agg(sort_array(collect_list(col("region"))).as("regions"))
}
