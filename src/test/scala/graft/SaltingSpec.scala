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

  test("adaptive salted join equals plain join, salting only the hot keys") {
    // three regimes in one fixture: "hot" (1000 rows, factor 10), "warm"
    // (250 rows, factor 3), and a long cold tail (factor 1 = unsalted)
    val big = ((1 to 1000).map(i => ("hot", i.toLong)) ++
      (1 to 250).map(i => ("warm", 10000L + i)) ++
      (1 to 500).map(i => (s"cold$i", 20000L + i))).toDF("key", "id")
    val small = (Seq(("hot", "H"), ("warm", "W"), ("nomatch", "X")) ++
      (1 to 500).map(i => (s"cold$i", s"C$i"))).toDF("key", "tag")

    val plain = big.join(small, "key")
      .select("key", "id", "tag").collect().map(_.toSeq)
    val adaptive = Salting.adaptiveSaltedJoin(big, small, "key", "id",
        hotThreshold = 100)
      .select("key", "id", "tag").collect().map(_.toSeq)
    // null keys match nothing in an inner join; the salted path must
    // drop them identically rather than NPE or cross-match
    val withNulls = big.unionByName(
      Seq((null.asInstanceOf[String], 99999L)).toDF("key", "id"))
    val nullSafe = Salting.adaptiveSaltedJoin(withNulls, small, "key", "id",
        hotThreshold = 100)
      .select("key", "id", "tag").collect().map(_.toSeq)
    assert(nullSafe.groupBy(identity).view.mapValues(_.size).toMap ==
      plain.groupBy(identity).view.mapValues(_.size).toMap,
      "a null big-side key changed the adaptive join result")
    // multiset equality: duplicates must neither drop nor multiply
    assert(adaptive.groupBy(identity).view.mapValues(_.size).toMap ==
      plain.groupBy(identity).view.mapValues(_.size).toMap)
    assert(adaptive.length === 1000 + 250 + 500)
    // the cap engages: a pathological threshold still caps the factor
    val capped = Salting.adaptiveSaltedJoin(big, small, "key", "id",
        hotThreshold = 1, maxSalts = 4)
      .select("key", "id", "tag").collect().map(_.toSeq)
    assert(capped.groupBy(identity).view.mapValues(_.size).toMap ==
      plain.groupBy(identity).view.mapValues(_.size).toMap)
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

  test("inputs carrying reserved working columns are refused loudly") {
    import spark.implicits._
    val big = Seq((1L, "k", 0)).toDF("id", "key", "__salt")
    val small = Seq(("k", "x")).toDF("key", "attr")
    val e = intercept[IllegalArgumentException] {
      graft.api.Salting.saltedJoin(big, small, "key", "id", 4)
    }
    assert(e.getMessage.contains("__salt"))
    val e2 = intercept[IllegalArgumentException] {
      graft.api.Salting.adaptiveSaltedJoin(
        small, big.withColumnRenamed("__salt", "__factor"), "key", "attr", 10L)
    }
    assert(e2.getMessage.contains("__factor"))
  }
}
