package graft.sources

import graft.SparkSuite

/** Tags: immutable named refs into the snapshot log. Created via
  * `CALL graft.system.tag`, read via `VERSION AS OF 'name'`,
  * retention-exempt in expire_snapshots (and therefore vacuum),
  * listed with branches in `graft.t.refs`.
  */
class ManifestTagSpec extends SparkSuite {

  private def fresh(): String =
    s"t_${java.util.UUID.randomUUID().toString.take(8)}"

  private def root: String = spark.conf.get("spark.sql.catalog.graft.root")

  test("tag pins a version; VERSION AS OF resolves the name; tags " +
    "are immutable; refs lists branches and tags") {
    val t = fresh(); val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT)")
      spark.sql(s"INSERT INTO graft.$t SELECT id FROM range(5)")
      // default version = verified current head
      val r = spark.sql(s"CALL graft.system.tag('$t', 'audit-v1')")
        .collect()(0)
      assert(r.getString(0) == "audit-v1")
      val pinned = r.getInt(1)
      assert(ManifestV2Sink.currentVersion(dir).contains(pinned))
      spark.sql(s"INSERT INTO graft.$t SELECT id FROM range(100, 110)")
      spark.sql(s"DELETE FROM graft.$t WHERE k < 2")
      // the tag still reads the exact pinned corpus
      assert(spark.sql(
        s"SELECT count(*), sum(k) FROM graft.$t VERSION AS OF 'audit-v1'")
        .head.toSeq == Seq(5L, 10L))
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 13L)
      // immutability: re-pointing is refused
      val e = intercept[Exception] {
        spark.sql(s"CALL graft.system.tag('$t', 'audit-v1')") }
      assert(e.getMessage.contains("immutable"), e.getMessage)
      // explicit-version tag + unknown tag name fails loudly
      spark.sql(s"CALL graft.system.tag('$t', 'v1-again', $pinned)")
      val e2 = intercept[Exception] {
        spark.sql(s"SELECT * FROM graft.$t VERSION AS OF 'nope'")
          .collect() }
      assert(e2.getMessage.contains("tag"), e2.getMessage)
      // refs metadata table: both tags (+ a branch)
      ManifestV2Sink.createBranch(dir, "dev")
      val refs = spark.sql(s"SELECT name, type, version FROM " +
        s"graft.$t.refs ORDER BY name").collect()
        .map(r2 => (r2.getString(0), r2.getString(1),
          if (r2.isNullAt(2)) -1 else r2.getInt(2))).toSeq
      assert(refs == Seq(("audit-v1", "tag", pinned),
        ("dev", "branch", -1), ("v1-again", "tag", pinned)), refs)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }

  test("expire_snapshots walks around tagged versions; drop_tag " +
    "releases the pin and vacuum reclaims") {
    val t = fresh(); val dir = s"$root/$t"
    try {
      spark.sql(s"CREATE TABLE graft.$t (k BIGINT)")
      spark.sql(s"INSERT INTO graft.$t SELECT /*+ COALESCE(1) */ id " +
        "FROM range(5)")
      val vTagged = ManifestV2Sink.currentVersion(dir).get
      spark.sql(s"CALL graft.system.tag('$t', 'keepme')")
      // the tagged snapshot's files: an OVERWRITE would orphan them
      // without the tag pin
      spark.sql(s"INSERT OVERWRITE graft.$t SELECT id FROM range(3)")
      spark.sql(s"INSERT INTO graft.$t VALUES (99)")
      spark.sql(
        s"CALL graft.system.expire_snapshots('$t', 1)").collect()
      // tagged version survived expiry
      assert(ManifestV2Sink.versions(dir).contains(vTagged))
      spark.sql(s"CALL graft.system.vacuum('$t')").collect()
      // and its data files survived vacuum: the tag still reads
      assert(spark.sql(
        s"SELECT sum(k) FROM graft.$t VERSION AS OF 'keepme'")
        .head.getLong(0) == 10L)
      // drop the tag: the pin releases, expiry+vacuum reclaim
      spark.sql(s"CALL graft.system.drop_tag('$t', 'keepme')")
      spark.sql(
        s"CALL graft.system.expire_snapshots('$t', 1)").collect()
      assert(!ManifestV2Sink.versions(dir).contains(vTagged))
      val deleted = spark.sql(s"CALL graft.system.vacuum('$t')")
        .collect()
      assert(deleted.nonEmpty, "vacuum reclaimed nothing post-drop")
      assert(spark.sql(s"SELECT count(*) FROM graft.$t")
        .head.getLong(0) == 4L)
    } finally spark.sql(s"DROP TABLE IF EXISTS graft.$t")
  }
}
