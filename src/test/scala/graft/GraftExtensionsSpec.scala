package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface installed by [[GraftExtensions]]: the
  * registered functions must be callable from pure `spark.sql` and
  * agree exactly with their DataFrame-API twins. */
class GraftExtensionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("graft_char_ngrams from SQL equals the operator form") {
    val got = spark.sql(
      "SELECT graft_char_ngrams('The  Quick fox', 3) AS g").as[Seq[String]].head()
    // canonicalization lives in the OPERATOR (LangId.canonical); the
    // raw SQL function works on the string as given
    assert(got.take(3) === Seq("The", "he ", "e  "))
    assert(got.length === "The  Quick fox".length - 2)
    assert(spark.sql("SELECT graft_char_ngrams('ab', 3) AS g")
      .as[Seq[String]].head() === Seq.empty)
  }

  test("graft_dot from SQL equals the column kernel, mixed element types") {
    val d = spark.sql(
      """SELECT graft_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(2.0 AS DOUBLE), CAST(0.5 AS DOUBLE))) AS d""".stripMargin)
      .as[Double].head()
    assert(d === 1.5 * 2.0 + 2.0 * 0.5)
  }

  test("graft_simhash60 from SQL equals PortableHash.simhash60") {
    val toks = Seq("alpha", "beta", "gamma")
    val got = spark.sql(
      s"SELECT graft_simhash60(array(${toks.map("'" + _ + "'").mkString(",")})) AS h")
      .as[Long].head()
    assert(got === graft.functions.PortableHash.simhash60(toks))
  }

  test("misuse fails loudly: wrong arity and non-literal n") {
    intercept[Exception](spark.sql("SELECT graft_dot(array(1.0))").collect())
    intercept[Exception](
      spark.sql("SELECT graft_char_ngrams('abc', length('xx'))").collect())
  }

  test("graft_normalize_url from SQL equals the Column form") {
    import org.apache.spark.sql.functions.col
    val urls = Seq(
      "HTTP://WWW.Ex.COM:80/p%41?utm_source=x&b=%32&a=1#frag",
      "https://h.io/a%2fb", " not a url ")
    val viaSql = urls.map(u => spark.sql(
      s"SELECT graft_normalize_url('$u') AS n").as[String].head())
    val viaCol = urls.toDF("u")
      .select(graft.functions.UrlFunctions.normalizeUrl(col("u")))
      .as[String].collect().toSeq
    assert(viaSql === viaCol)
    assert(viaSql.head === "http://www.ex.com/pA?a=1&b=2")
  }

  test("graft_registrable_domain from SQL: longest match; non-foldable suffixes rejected") {
    val got = spark.sql(
      """SELECT graft_registrable_domain('a.b.example.co.uk',
        |  array('uk', 'co.uk', 'com')) AS d""".stripMargin).as[String].head()
    assert(got === "example.co.uk")
    // subdomain collapse through the SQL surface
    val mega = spark.sql(
      "SELECT graft_registrable_domain('user7.megasite.com', array('com')) AS d")
      .as[String].head()
    assert(mega === "megasite.com")
    // the suffix set must compile into the plan: a per-row column
    // argument is a policy error, rejected at analysis
    intercept[Exception](spark.sql(
      "SELECT graft_registrable_domain('a.com', array(concat('c', rand()))) ").collect())
  }

  test("graft_sign_code / graft_hamming from SQL equal the Column forms") {
    import org.apache.spark.sql.functions.col
    val vec = (0 until 64).map(i => (i * 37 % 11 - 5).toFloat)
    val df = Seq(Tuple1(vec)).toDF("v")
    df.createOrReplaceTempView("g_sign_test")
    val viaSql = spark.sql(
      "SELECT graft_sign_code(v, 64, 60) AS c FROM g_sign_test").as[Long].head()
    val viaCol = df.select(
        graft.functions.VectorFunctions.signLshBucket(col("v"), 64, 60))
      .as[Long].head()
    assert(viaSql === viaCol)
    // hamming: pure integer xor+popcount
    assert(spark.sql("SELECT graft_hamming(5, 3) AS h").as[Int].head() === 2)
    assert(spark.sql(
      s"SELECT graft_hamming($viaSql, $viaSql) AS h").as[Int].head() === 0)
    // dim/bits must be literals (they parameterize the plane literals)
    intercept[Exception](spark.sql(
      "SELECT graft_sign_code(v, CAST(rand()*64 AS INT), 60) FROM g_sign_test").collect())
  }
}
