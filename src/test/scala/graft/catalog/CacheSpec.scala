package graft.catalog

import java.nio.file.Files

import graft.SparkSpec

/** Port of the reference cache accounting tests (tests/test_cache.py:
  * hit/miss/size via cache_info). */
class CacheSpec extends SparkSpec {

  private def fixture(): (DataSource, MemoryCache) = {
    val dir = Files.createTempDirectory("graft_cache")
    val csv = dir.resolve("t.csv")
    Files.writeString(csv, "a,b\n1,x\n2,y\n")
    val cache = new MemoryCache
    val ds = new DataSource(spark, dir.toString, initialCache = cache)
    ds.addTableFromFile(csv.toString)
    (ds, cache)
  }

  test("first access misses, repeats hit (test_cache_hits)") {
    val (ds, cache) = fixture()
    ds.table("t").count()
    val (h1, m1, s1) = cache.info
    assert(m1 === 1 && s1 === 1)
    ds.table("t").count()
    ds.table("t").count()
    val (h2, m2, _) = cache.info
    assert(h2 === h1 + 2 && m2 === m1)
  }

  test("clear resets counters and unpersists (test_cache_clear)") {
    val (ds, cache) = fixture()
    val df = ds.table("t")
    df.count()
    assert(df.storageLevel.useMemory) // persisted by the cache
    cache.clear()
    assert(cache.info === ((0L, 0L, 0)))
    assert(!df.storageLevel.useMemory) // unpersisted
  }

  test("maxsize evicts the least-recently-used entry (test_maxsize)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cache_max")
    val cache = new MemoryCache(maxsize = Some(1))
    def table(n: String) = {
      val p = dir.resolve(s"$n.csv")
      java.nio.file.Files.writeString(p, "a\n1\n2\n")
      FileTable(n, p.toString)
    }
    val (t1, t2) = (table("t1"), table("t2"))
    cache.get(spark, t1) // miss, size 1
    cache.get(spark, t2) // miss, t1 evicted
    assert(cache.info === ((0L, 2L, 1)))
    cache.get(spark, t2) // hit (still resident)
    cache.get(spark, t1) // miss again — was evicted
    assert(cache.info === ((1L, 3L, 1)))
    cache.clear()
  }

  test("DoNothingCache never memoizes (DoNothingCache parity)") {
    val dir = Files.createTempDirectory("graft_cache2")
    val csv = dir.resolve("t.csv")
    Files.writeString(csv, "a\n1\n")
    val ds = new DataSource(spark, dir.toString,
      initialCache = new DoNothingCache)
    ds.addTableFromFile(csv.toString)
    assert(!ds.table("t").storageLevel.useMemory)
  }

  test("sqlQueryReduced returns a scalar for 1x1 results") {
    val li = graft.Tables.load(spark, sf0001, "lineitem")
    graft.api.DfSql.sqlQueryReduced(
      "SELECT count(*) AS n FROM li", "li" -> li) match {
      case QueryResult.Scalar(v) => assert(v.asInstanceOf[Long] > 0)
      case other => fail(s"expected Scalar, got $other")
    }
  }
}
