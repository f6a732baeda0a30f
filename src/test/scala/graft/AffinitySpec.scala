package graft

import graft.ops.Affinity
import org.apache.spark.sql.functions._

/** M3/M4 — the reference's commented-out clustering modes (cluster.py:
  * 40-50), implemented as bounded-group flatMapGroups kernels. The hash
  * gates are q179/q180; this spec covers the algorithmic properties and
  * the grouped scale faces the gates don't exercise.
  */
class AffinitySpec extends SparkSpec {

  private def toyVecs: Array[(Long, Array[Double])] = {
    // 3 well-separated directions on the unit sphere, 4 points each
    val base = Seq((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))
    base.zipWithIndex.flatMap { case ((x, y, z), c) =>
      (1 to 4).map { p =>
        val e = 0.05 * p
        val v = Array(x + (if (c != 0) e else 0.0),
          y + (if (c != 1) e else 0.0), z)
        (c * 4L + p - 1, v)
      }
    }.toArray
  }

  test("AP kernel recovers well-separated clusters with one exemplar each") {
    val pts = toyVecs
    val out = Affinity.apKernel(pts.map(_._1), pts.map(_._2),
      preference = -4.0, damping = 0.7, rounds = 30)
    val nEx = out.head._4
    assert(nEx == 3, s"expected 3 exemplars, got $nEx")
    val groups = out.groupBy(_._3).values.map(_.map(_._1).toSet).toSet
    assert(groups == Set(Set(0L, 1L, 2L, 3L), Set(4L, 5L, 6L, 7L),
      Set(8L, 9L, 10L, 11L)), s"wrong partition: $groups")
    // exemplars are members of their own cluster
    out.filter(r => r._2 > 0.0).foreach(r => assert(r._3 == r._1))
  }

  test("agglomerative kernel: complete-linkage merges on hand-checked points") {
    // 1-d line embedded in 2-d: complete linkage at k=2 must split the
    // far point from the tight triple
    val ids = Array(10L, 11L, 12L, 13L)
    val vecs = Array(Array(1.0, 0.0), Array(1.0, 0.05), Array(1.0, 0.1),
      Array(0.0, 1.0))
    val out = Affinity.aggloKernel(ids, vecs, nClusters = 2)
    val byCluster = out.groupBy(_._2).map { case (c, m) => c -> m.map(_._1).toSet }
    assert(byCluster == Map(10L -> Set(10L, 11L, 12L), 13L -> Set(13L)),
      s"got $byCluster")
    assert(out.forall(r => r._3 == (if (r._2 == 10L) 3L else 1L)))
  }

  test("grouped operators: one kernel per label group, label-local output") {
    val emb = sf0001.embeddings.filter(col("vec_id") < 60)
    val ap = Affinity.apGrouped(emb, "label", "vec_id", "embedding",
      rounds = 5).collect()
    val hc = Affinity.agglomerativeGrouped(emb, "label", "vec_id", "embedding",
      nClusters = 3).collect()
    val byLabel = emb.select(col("label").cast("string"), col("vec_id"))
      .collect().groupBy(_.getString(0)).map { case (l, rows) =>
        l -> rows.map(_.getLong(1)).toSet
      }
    assert(ap.length == byLabel.values.map(_.size).sum)
    assert(hc.length == ap.length)
    // every assigned cluster id is a member of the SAME group
    ap.foreach { r =>
      val members = byLabel(r.getString(0))
      assert(members.contains(r.getLong(1)) && members.contains(r.getLong(3)))
    }
    hc.foreach { r =>
      val members = byLabel(r.getString(0))
      assert(members.contains(r.getLong(2)), s"foreign label in $r")
    }
    // agglomerative: exactly min(|group|, 3) clusters per group, sizes
    // partition the group
    hc.groupBy(_.getString(0)).foreach { case (l, rows) =>
      val want = math.min(byLabel(l).size, 3)
      assert(rows.map(_.getLong(2)).distinct.length == want)
      // each member reports its cluster's size: per-cluster rows agree
      // with the actual member count
      rows.groupBy(_.getLong(2)).foreach { case (_, m) =>
        assert(m.forall(_.getLong(3) == m.length.toLong))
      }
    }
  }

  test("apClusters applies the ref's >=3-members-above-.55 gate, sim-ordered") {
    import spark.implicits._
    val df = toyVecs.toSeq.map { case (id, v) => ("t", id, v.map(_.toFloat).toSeq) }
      .toDF("g", "vec_id", "embedding")
    val out = Affinity.apClusters(df, "g", "vec_id", "embedding", rounds = 30)
      .collect()
    // all three tight toy clusters survive the gate with all 4 members
    val byCluster = out.groupBy(_.getLong(1))
    assert(byCluster.size == 3 && byCluster.values.forall(_.length == 4))
    byCluster.values.foreach { rows =>
      val ranked = rows.sortBy(_.getInt(2))
      assert(ranked.map(_.getInt(2)).toSeq == Seq(1, 2, 3, 4))
      // rank 1 is the exemplar at cosine exactly 1.0; ranks descend in sim
      assert(ranked.head.getDouble(4) == 1.0)
      assert(ranked.head.getLong(3) == ranked.head.getLong(1))
      val sims = ranked.map(_.getDouble(4)).toSeq
      assert(sims == sims.sorted.reverse && sims.forall(_ > 0.55))
    }
  }

  test("gate queries are deterministic across runs") {
    val a1 = graft.ops.Affinity.qAffinityProp(sf0001).collect().toSeq
    val a2 = graft.ops.Affinity.qAffinityProp(sf0001).collect().toSeq
    assert(a1 == a2)
    val g1 = graft.ops.Affinity.qAgglomerative(sf0001).collect().toSeq
    val g2 = graft.ops.Affinity.qAgglomerative(sf0001).collect().toSeq
    assert(g1 == g2)
    assert(a1.nonEmpty && g1.nonEmpty)
  }

  test("oracle contract: every SF has at least the q179/q180 subset sizes") {
    // the generated oracles unroll a FIXED round count from the subset
    // parameter; the replay is exact only when the table has >= n rows
    // (Affinity.scala scaladoc) — pin that precondition per SF. ADVICE r8:
    // the kernels degrade NaN (zero-norm) vectors to singletons but the
    // DuckDB replay has no counterpart (1/0 → Inf, NULL comparison
    // semantics), so a zero-norm embedding among the oracled subset would
    // DIVERGE the gate rather than fail cleanly — assert every embedding
    // among the first max(n)=24 vec_ids has a non-zero norm too.
    Seq("sf0.001", "sf0.01", "sf0.1").foreach { sf =>
      val emb = spark.read.parquet(s"/root/testdata/$sf/embeddings.parquet")
      val n = emb.count()
      assert(n >= 24, s"$sf has $n embeddings — q179/q180 oracles need >= 24")
      val zeroNorm = emb.orderBy(col("vec_id")).limit(24)
        .select(col("vec_id"),
          expr("aggregate(embedding, 0D, (acc, e) -> acc + CAST(e AS DOUBLE) * CAST(e AS DOUBLE))").as("sq"))
        .filter(col("sq") <= 0.0).collect()
      assert(zeroNorm.isEmpty,
        s"$sf zero-norm embeddings in oracled subset: ${zeroNorm.mkString(",")}")
    }
  }

  test("kernels degrade gracefully on zero-norm vectors (NaN distances)") {
    val ids = Array(1L, 2L, 3L, 4L)
    val vecs = Array(Array(1.0, 0.0), Array(0.9, 0.1),
      Array(0.0, 0.0), Array(0.0, 0.0)) // two zero vectors → NaN distances
    val hc = Affinity.aggloKernel(ids, vecs, nClusters = 1)
    // the two real vectors merge; zero vectors stay singletons, no crash
    assert(hc.length == 4)
    assert(hc.find(_._1 == 2L).get._2 == 1L)
    assert(hc.find(_._1 == 3L).get._2 == 3L && hc.find(_._1 == 4L).get._2 == 4L)
    val ap = Affinity.apKernel(ids, vecs, preference = -4.0, damping = 0.7,
      rounds = 10)
    assert(ap.length == 4) // no crash; assignments defined for every row
  }

  test("roundMicro matches DuckDB round-on-the-product semantics") {
    // boundary products: the damped recurrence lands on x.5 micros
    assert(Affinity.roundMicro(-0.10469149999999999) == -0.104692) // m = -104691.5 exactly
    assert(Affinity.roundMicro(1.0000015) == 1.000002)
    assert(Affinity.roundMicro(-0.5071355) == -0.507135) // m below the boundary
    assert(Affinity.roundMicro(0.0) == 0.0)
  }
}
