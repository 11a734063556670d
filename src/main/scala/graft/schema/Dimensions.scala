package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}

/** S4 static dimension seeds (SURVEY.md §2.1): the reference ships
  * Genre/Language/Country/WatchProvider as literal idempotent MERGE
  * scripts (kg_scripts/2_init_nodes.cypher). Here they are literal
  * DataFrames — small enough to broadcast into every edge build.
  *
  * Genre carries the public TMDB genre id space; Language/Country carry
  * representative ISO-639-1 / ISO-3166-1 rows; WatchProvider a sample id
  * space. A production deployment would load the full seed from a CSV via
  * [[graft.operators.Sinks.seedFromCsv]] — the shape, not the row count,
  * is the contract.
  */
object Dimensions {

  val genreRows: Seq[(Long, String)] = Seq(
    28L -> "Action", 12L -> "Adventure", 16L -> "Animation", 35L -> "Comedy",
    80L -> "Crime", 99L -> "Documentary", 18L -> "Drama", 10751L -> "Family",
    14L -> "Fantasy", 36L -> "History", 27L -> "Horror", 10402L -> "Music",
    9648L -> "Mystery", 10749L -> "Romance", 878L -> "Science Fiction",
    10770L -> "TV Movie", 53L -> "Thriller", 10752L -> "War", 37L -> "Western")

  val languageRows: Seq[(String, String)] = Seq(
    "en" -> "English", "fr" -> "French", "de" -> "German", "es" -> "Spanish",
    "it" -> "Italian", "ja" -> "Japanese", "ko" -> "Korean", "zh" -> "Chinese",
    "pt" -> "Portuguese", "ru" -> "Russian", "hi" -> "Hindi", "ar" -> "Arabic",
    "nl" -> "Dutch", "sv" -> "Swedish", "no" -> "Norwegian", "da" -> "Danish",
    "fi" -> "Finnish", "pl" -> "Polish", "tr" -> "Turkish", "th" -> "Thai")

  val countryRows: Seq[(String, String)] = Seq(
    "US" -> "United States of America", "GB" -> "United Kingdom",
    "FR" -> "France", "DE" -> "Germany", "ES" -> "Spain", "IT" -> "Italy",
    "JP" -> "Japan", "KR" -> "South Korea", "CN" -> "China", "IN" -> "India",
    "BR" -> "Brazil", "MX" -> "Mexico", "CA" -> "Canada", "AU" -> "Australia",
    "NL" -> "Netherlands", "SE" -> "Sweden", "NO" -> "Norway", "DK" -> "Denmark",
    "PL" -> "Poland", "TR" -> "Turkey", "ID" -> "Indonesia", "NZ" -> "New Zealand")

  val watchProviderRows: Seq[(Long, String)] = Seq(
    2L -> "AlphaShop", 3L -> "LouerTout", 8L -> "Streamly", 9L -> "PrimeView",
    15L -> "HorizonPlus", 337L -> "DiscFlix", 350L -> "CineBox", 384L -> "MaxHub")

  def genres(spark: SparkSession): DataFrame = {
    import spark.implicits._
    genreRows.toDF("genre_id", "name")
  }
  def languages(spark: SparkSession): DataFrame = {
    import spark.implicits._
    languageRows.toDF("language_id", "name")
  }
  def countries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    countryRows.toDF("country_id", "name")
  }
  def watchProviders(spark: SparkSession): DataFrame = {
    import spark.implicits._
    watchProviderRows.toDF("provider_id", "name")
  }
}
