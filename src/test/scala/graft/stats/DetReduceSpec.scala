package graft.stats

import graft.SparkSpec

class DetReduceSpec extends SparkSpec {

  test("fold order is ascending partition id at every fan-in (multi-level included)") {
    // merge = list concatenation: the result IS the fold order, so this
    // checks ordering exactly rather than through FP-sum coincidence
    val nParts = 24
    val rdd = spark.sparkContext.parallelize(0 until nParts, nParts)
      .mapPartitionsWithIndex((pid, _) => Iterator.single(Vector(pid)))
    val expected = (0 until nParts).toVector
    for (fanIn <- Seq(2, 3, 5, 64)) {
      val got = DetReduce.orderedReduce[Vector[Int]](rdd, _ ++ _, Vector.empty, fanIn)
      assert(got == expected, s"fanIn=$fanIn: $got")
    }
  }

  test("repeated runs are identical; empty RDD yields the empty value") {
    val rdd = spark.sparkContext.parallelize(1 to 1000, 13)
      .mapPartitions(it => Iterator.single(it.map(x => 1.0 / x).sum))
    val a = DetReduce.orderedReduce[Double](rdd, _ + _, 0.0, fanIn = 3)
    val b = DetReduce.orderedReduce[Double](rdd, _ + _, 0.0, fanIn = 3)
    assert(a == b) // bit-identical, not just approximately
    val empty = spark.sparkContext.parallelize(Seq.empty[Double], 1)
      .mapPartitions(_ => Iterator.empty: Iterator[Double])
    assert(DetReduce.orderedReduce[Double](empty, _ + _, -1.0) == -1.0)
  }
}
