package graft.schema

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small fully-synthetic corpus replaying the TMDB document *shapes*
  * (FIXTURES.md §1) so the nested-document operators (Clean C1-C8) have
  * golden inputs without any network source. Content is invented — only
  * the structure mirrors the reference's mock_apis fixtures.
  *
  * Deliberate edge cases baked in:
  *  - movie 102 has no collection, empty overview (""->NULL path), zero
  *    budget/revenue/runtime (0->NULL path), and NO external_ids (the
  *    stale-fixture landmine of SURVEY.md §5 — here it must yield NULL
  *    wiki_id, not an error).
  *  - movie 103 has empty arrays everywhere (the empty-branch guards of
  *    etl_flow.py:552-565).
  *  - gender code 7 on one crew member (unknown enum -> NULL decode).
  *  - company 21 -> 20 -> 10 parent chain for the hierarchy closure (J4).
  */
object TmdbCorpus {

  val movieJson: Seq[String] = Seq(
    """{"adult":false,"id":101,"imdb_id":"tt9100001","title":"Harbor of Glass","original_title":"Harbor of Glass","original_language":"en",
      |"overview":"A tidal engineer uncovers a city beneath the breakwater.","tagline":"Below the tide","status":"Released","homepage":"",
      |"budget":42000000,"revenue":151000000,"runtime":124,"popularity":81.5,"vote_average":7.3,"vote_count":1841,"release_date":"2024-06-14",
      |"origin_country":["US"],
      |"belongs_to_collection":{"id":900,"name":"Harbor Saga","poster_path":null,"backdrop_path":null},
      |"genres":[{"id":18,"name":"Drama"},{"id":878,"name":"Science Fiction"}],
      |"production_companies":[{"id":10,"logo_path":null,"name":"Meridian Films","origin_country":"US"},{"id":21,"logo_path":null,"name":"Tidegate Pictures","origin_country":"GB"}],
      |"production_countries":[{"iso_3166_1":"US","name":"United States of America"},{"iso_3166_1":"GB","name":"United Kingdom"}],
      |"spoken_languages":[{"english_name":"English","iso_639_1":"en","name":"English"},{"english_name":"French","iso_639_1":"fr","name":"Francais"}],
      |"credits":{"cast":[
      |  {"adult":false,"gender":1,"id":5001,"known_for_department":"Acting","name":"Mara Quin","original_name":"Mara Quin","popularity":14.2,"profile_path":null,"cast_id":1,"character":"Ila Voss","credit_id":"c101a","order":0},
      |  {"adult":false,"gender":2,"id":5002,"known_for_department":"Acting","name":"Dev Arani","original_name":"Dev Arani","popularity":9.8,"profile_path":null,"cast_id":2,"character":"","credit_id":"c101b","order":1}],
      | "crew":[
      |  {"adult":false,"gender":2,"id":6001,"known_for_department":"Directing","name":"Rollo Nakae","original_name":"Rollo Nakae","popularity":5.1,"profile_path":null,"credit_id":"w101a","department":"Directing","job":"Director"},
      |  {"adult":false,"gender":1,"id":6002,"known_for_department":"Writing","name":"Suri Ames","original_name":"Suri Ames","popularity":3.3,"profile_path":null,"credit_id":"w101b","department":"Writing","job":"Screenplay"},
      |  {"adult":false,"gender":7,"id":6003,"known_for_department":"Sound","name":"Pex Olan","original_name":"Pex Olan","popularity":1.0,"profile_path":null,"credit_id":"w101c","department":"Sound","job":""}]},
      |"watch_providers":{"results":{
      |  "US":{"link":"https://example.test/101/US","buy":[{"logo_path":null,"provider_id":2,"provider_name":"AlphaShop","display_priority":1}],"rent":[{"logo_path":null,"provider_id":2,"provider_name":"AlphaShop","display_priority":1}],"flatrate":[{"logo_path":null,"provider_id":8,"provider_name":"Streamly","display_priority":2}]},
      |  "FR":{"link":"https://example.test/101/FR","buy":[],"rent":[{"logo_path":null,"provider_id":3,"provider_name":"LouerTout","display_priority":4}],"flatrate":[{"logo_path":null,"provider_id":8,"provider_name":"Streamly","display_priority":1}]}}},
      |"external_ids":{"wikidata_id":"Q9100001","imdb_id":"tt9100001"}}""".stripMargin.replace("\n", ""),

    """{"adult":false,"id":102,"imdb_id":"tt9100002","title":"Quiet Meridian","original_title":"Quiet Meridian","original_language":"fr",
      |"overview":"","tagline":"","status":"Released","homepage":"",
      |"budget":0,"revenue":0,"runtime":0,"popularity":0.0,"vote_average":6.1,"vote_count":204,"release_date":"2024-07-02",
      |"origin_country":["FR"],
      |"belongs_to_collection":null,
      |"genres":[{"id":35,"name":"Comedy"}],
      |"production_companies":[{"id":30,"logo_path":null,"name":"Clairvoie","origin_country":"FR"}],
      |"production_countries":[{"iso_3166_1":"FR","name":"France"}],
      |"spoken_languages":[{"english_name":"French","iso_639_1":"fr","name":"Francais"}],
      |"credits":{"cast":[
      |  {"adult":false,"gender":0,"id":5003,"known_for_department":"Acting","name":"Noe Calder","original_name":"Noe Calder","popularity":2.2,"profile_path":null,"cast_id":1,"character":"Le Gardien","credit_id":"c102a","order":0}],
      | "crew":[
      |  {"adult":false,"gender":3,"id":6004,"known_for_department":"Editing","name":"Ash Verel","original_name":"Ash Verel","popularity":0.4,"profile_path":null,"credit_id":"w102a","department":"Editing","job":"Editor"}]},
      |"watch_providers":{"results":{
      |  "FR":{"link":"https://example.test/102/FR","buy":[{"logo_path":null,"provider_id":3,"provider_name":"LouerTout","display_priority":2}],"rent":[],"flatrate":[]}}}}""".stripMargin.replace("\n", ""),

    """{"adult":false,"id":103,"imdb_id":"tt9100003","title":"Third Signal","original_title":"Third Signal","original_language":"en",
      |"overview":"Static on every channel.","tagline":"","status":"Released","homepage":"",
      |"budget":120000,"revenue":0,"runtime":81,"popularity":3.4,"vote_average":5.0,"vote_count":12,"release_date":"2024-07-19",
      |"origin_country":[],
      |"belongs_to_collection":null,
      |"genres":[],
      |"production_companies":[],
      |"production_countries":[],
      |"spoken_languages":[],
      |"credits":{"cast":[],"crew":[]},
      |"watch_providers":{"results":{}},
      |"external_ids":{"wikidata_id":"","imdb_id":"tt9100003"}}""".stripMargin.replace("\n", ""))

  val collectionJson: Seq[String] = Seq(
    """{"id":900,"name":"Harbor Saga","overview":"Three films about the drowned city.","poster_path":null,"backdrop_path":null}""",
    """{"id":901,"name":"Signal Files","overview":"","poster_path":null,"backdrop_path":null}""")

  /** Parent chain: 21 -> 20 -> 10 -> (none). 30 is standalone. */
  val companyJson: Seq[String] = Seq(
    """{"description":"Independent harbor-town studio.","headquarters":"Bristol, England","homepage":"","id":21,"logo_path":null,"name":"Tidegate Pictures","origin_country":"GB","parent_company":{"id":20,"name":"Tidegate Group"}}""",
    """{"description":"","headquarters":"London, England","homepage":"","id":20,"logo_path":null,"name":"Tidegate Group","origin_country":"GB","parent_company":{"id":10,"name":"Meridian Films"}}""",
    """{"description":"Flagship production house.","headquarters":"Los Angeles, California","homepage":"","id":10,"logo_path":null,"name":"Meridian Films","origin_country":"US","parent_company":null}""",
    """{"description":"","headquarters":"","homepage":"","id":30,"logo_path":null,"name":"Clairvoie","origin_country":"","parent_company":null}""")

  val personJson: Seq[String] = Seq(
    """{"adult":false,"also_known_as":["M. Quin"],"biography":"Stage actor turned film lead.","birthday":"1987-03-12","deathday":null,"gender":1,"homepage":null,"id":5001,"imdb_id":"nm9000001","known_for_department":"Acting","name":"Mara Quin","place_of_birth":"Wellington, New Zealand","popularity":14.2,"profile_path":null}""",
    """{"adult":false,"also_known_as":[],"biography":"","birthday":null,"deathday":null,"gender":0,"homepage":null,"id":5003,"imdb_id":"nm9000003","known_for_department":"Acting","name":"Noe Calder","place_of_birth":"","popularity":0.0,"profile_path":null}""")

  def movies(spark: SparkSession): DataFrame = readJson(spark, movieJson, TmdbSchemas.movieDetails)
  def collections(spark: SparkSession): DataFrame = readJson(spark, collectionJson, TmdbSchemas.collectionDetails)
  def companies(spark: SparkSession): DataFrame = readJson(spark, companyJson, TmdbSchemas.companyDetails)
  def persons(spark: SparkSession): DataFrame = readJson(spark, personJson, TmdbSchemas.personDetails)

  private def readJson(spark: SparkSession, docs: Seq[String],
                       schema: org.apache.spark.sql.types.StructType): DataFrame = {
    import spark.implicits._
    spark.read.schema(schema).json(docs.toDS)
  }
}
