package graft

import org.apache.spark.sql.functions._

import graft.api.Salting

/** Salted joins must produce exactly the rows of the plain join while
  * spreading hot keys across partitions. */
class SaltingSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of the big side shares one hot key
    val big = (1 to 10000)
      .map(i => (if (i % 10 == 0) s"k$i" else "hot", i.toLong))
      .toDF("key", "id")
    val small = Seq(("hot", "H"), ("k10", "A"), ("k20", "B"), ("nomatch", "X"))
      .toDF("key", "tag")

    val plain = big.join(small, "key")
      .select("key", "id", "tag").collect().map(_.toSeq).toSet
    val salted = Salting.saltedJoin(big, small, "key", "id", 8)
      .select("key", "id", "tag").collect().map(_.toSeq).toSet
    assert(salted === plain)
    assert(salted.size === 9000 + 2)
  }

  test("hot key spreads across partitions under the salted shuffle") {
    val big = (1 to 8000).map(i => ("hot", i.toLong)).toDF("key", "id")
    val salted = big.withColumn("__salt",
      pmod(xxhash64(col("id")), lit(8)).cast("int"))
      .repartition(8, col("key"), col("__salt"))
    val sizes = salted.mapPartitions(it => Iterator.single(it.size)).collect()
    assert(sizes.count(_ > 0) > 1, "hot key must occupy more than one partition")
    assert(sizes.max < 8000, "no single straggler partition")
  }
}
