package graft

import graft.functions.{CosineSimilarity, HammingDistance}

/** The engine's SQL surface: tables registered as views + custom functions
  * in the registry make every capability reachable from `spark.sql`. */
class SqlSurfaceSpec extends SparkSpec {

  test("spark.sql over registered views and custom functions") {
    CosineSimilarity.register(spark)
    HammingDistance.register(spark)
    Tables.documents(spark, "/root/testdata/sf0.001").createOrReplaceTempView("documents")
    Tables.embeddings(spark, "/root/testdata/sf0.001").createOrReplaceTempView("embeddings")

    val hd = spark.sql("SELECT hamming_dist('0110', '0011') AS d").collect()(0).getInt(0)
    assert(hd == 2)

    val cos = spark.sql(
      """SELECT cosine_sim(transform(a.embedding, x -> CAST(x AS DOUBLE)),
                           transform(a.embedding, x -> CAST(x AS DOUBLE))) AS c
         FROM embeddings a WHERE a.vec_id = 0""").collect()(0).getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val n = spark.sql(
      """SELECT count(*) FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
         WHERE d.lang = 'en'""").collect()(0).getLong(0)
    assert(n > 0)
  }
}
