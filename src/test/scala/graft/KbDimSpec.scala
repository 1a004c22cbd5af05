package graft

/** The writable catalog table's row-level DML contract (kb.dim,
  * SupportsRowLevelOperations): every SQL verb a warehouse user runs
  * against a dimension, plus the manifest-commit guarantees. */
class KbDimSpec extends SparkSpec {

  private def reset(): Unit =
    spark.sql("INSERT OVERWRITE kb.dim VALUES (1L, 10L, 'a'), (2L, 20L, 'b'), (3L, 30L, 'c')")

  private def snap(): Set[(Long, Long, String)] =
    spark.sql("SELECT k, v, tag FROM kb.dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet

  test("INSERT OVERWRITE replaces, INSERT appends") {
    reset()
    assert(snap() == Set((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")))
    spark.sql("INSERT INTO kb.dim VALUES (4L, 40L, 'd')")
    assert(snap() == Set((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c"), (4L, 40L, "d")))
    reset()
    assert(snap() == Set((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")))
  }

  test("DELETE FROM and UPDATE rewrite matched rows and carry the rest") {
    reset()
    spark.sql("DELETE FROM kb.dim WHERE k = 2")
    assert(snap() == Set((1L, 10L, "a"), (3L, 30L, "c")))
    spark.sql("UPDATE kb.dim SET v = v + 5, tag = 'up' WHERE k >= 3")
    assert(snap() == Set((1L, 10L, "a"), (3L, 35L, "up")))
  }

  test("MERGE INTO exercises update, insert, and not-matched-by-source delete") {
    reset()
    spark.sql(
      """MERGE INTO kb.dim t
        |USING (SELECT * FROM VALUES (2L, 200L, 's'), (9L, 900L, 's') AS s(k, v, tag)) s
        |ON t.k = s.k
        |WHEN MATCHED THEN UPDATE SET v = t.v + s.v, tag = s.tag
        |WHEN NOT MATCHED THEN INSERT (k, v, tag) VALUES (s.k, s.v, s.tag)
        |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(snap() == Set((2L, 220L, "s"), (9L, 900L, "s")))
  }

  test("the _file metadata column exposes the replacement-group id") {
    reset()
    val files = spark.sql("SELECT _file FROM kb.dim")
      .collect().map(_.getString(0)).toSet
    assert(files.nonEmpty && files.forall(_.endsWith(".kbd")), files.toString)
    // data columns never include it unless asked
    assert(spark.sql("SELECT * FROM kb.dim").columns.toSeq == Seq("k", "v", "tag"))
  }

  test("VERSION AS OF reads the immutable snapshot; snapshots are read-only") {
    reset()
    val dir = graft.sources.KbDim.resolveDir(spark)
    val v1 = graft.sources.KbDim.latestVersion(dir)
    spark.sql("UPDATE kb.dim SET v = v * 100 WHERE k = 1")
    val v2 = graft.sources.KbDim.latestVersion(dir)
    assert(v2 == v1 + 1, s"update must publish exactly one snapshot ($v1 -> $v2)")
    val before = spark.sql(s"SELECT v FROM kb.dim VERSION AS OF $v1 WHERE k = 1")
      .collect().map(_.getLong(0)).toSeq
    val after = spark.sql(s"SELECT v FROM kb.dim VERSION AS OF $v2 WHERE k = 1")
      .collect().map(_.getLong(0)).toSeq
    assert(before == Seq(10L), s"before-image drifted: $before")
    assert(after == Seq(1000L), s"after-image wrong: $after")
    // a pinned snapshot must refuse DML
    val err = intercept[Exception] {
      spark.sql(s"DELETE FROM kb.dim VERSION AS OF $v1 WHERE k = 1")
    }
    assert(err != null)
    // unknown snapshot fails loudly, not as an empty table
    val missing = intercept[Exception] {
      spark.sql("SELECT * FROM kb.dim VERSION AS OF 999999").collect()
    }
    assert(missing.getMessage != null)
  }

  test("unstorable values fail loudly instead of silently changing") {
    reset()
    // NULLs: the line format can't represent them; getLong-on-null would
    // store 0 and a null string would store the literal "null"
    val nullErr = intercept[Exception] {
      spark.sql("INSERT INTO kb.dim VALUES (7L, CAST(NULL AS BIGINT), 'x')")
    }
    assert(nullErr.toString.toLowerCase.contains("null") ||
      Option(nullErr.getCause).exists(_.toString.toLowerCase.contains("null")))
    // embedded newline would corrupt the framing of every later read
    val nlErr = intercept[Exception] {
      spark.sql("INSERT INTO kb.dim VALUES (8L, 80L, concat('a', chr(10), 'b'))")
    }
    assert(nlErr != null)
    // the failed inserts must not have changed the table
    assert(snap() == Set((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")))
  }

  test("an orphan snapshot from a crashed commit is not readable") {
    reset()
    val dir = graft.sources.KbDim.resolveDir(spark)
    val latest = graft.sources.KbDim.latestVersion(dir)
    // simulate the crash window: snapshot file exists, live manifest was
    // never republished — the version must not resolve
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, s"_files.v${latest + 1}"),
      s"#v=${latest + 1}\npart-orphan.kbd\n")
    val err = intercept[Exception] {
      spark.sql(s"SELECT * FROM kb.dim VERSION AS OF ${latest + 1}").collect()
    }
    assert(err.toString.contains("not a committed snapshot") ||
      Option(err.getCause).exists(_.toString.contains("not a committed snapshot")),
      err.toString.take(300))
    // and the live table still reads fine
    assert(snap().nonEmpty)
  }

  test("commits are manifest-atomic: unreferenced staging never leaks into reads") {
    reset()
    val dir = graft.sources.KbDim.resolveDir(spark)
    // drop a garbage file into the table directory WITHOUT touching the
    // manifest: readers must ignore it (manifest is the commit point)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(dir, "part-orphan-junk.kbd"), "99\t99\tjunk\n")
    assert(!snap().contains((99L, 99L, "junk")),
      "reader picked up a file the manifest never committed")
  }

  test("VACUUM expires old snapshots and their orphaned files, keeps retained versions byte-identical") {
    import graft.sources.KbDim
    reset()
    val dir = KbDim.resolveDir(spark)
    spark.sql("UPDATE kb.dim SET v = v + 1, tag = 'u1' WHERE k = 1")
    spark.sql("UPDATE kb.dim SET v = v + 1, tag = 'u2' WHERE k = 2")
    val latest = KbDim.latestVersion(dir)
    val keptBefore = spark.sql(
      s"SELECT k, v, tag FROM kb.dim VERSION AS OF ${latest - 1}")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    def dirFiles(): Set[String] =
      new java.io.File(dir).listFiles().map(_.getName).toSet
    val before = dirFiles()
    val (snaps, files) = KbDim.vacuum(dir, retain = 2)
    assert(snaps >= 1, s"at least the seed snapshot must expire (got $snaps)")
    // expired version: loud failure, not a silent empty read
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM kb.dim VERSION AS OF ${latest - 2}").collect())
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
    // retained versions: byte-identical reads
    val keptAfter = spark.sql(
      s"SELECT k, v, tag FROM kb.dim VERSION AS OF ${latest - 1}")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(keptAfter == keptBefore, "retained snapshot changed under vacuum")
    assert(snap() == Set((1L, 11L, "u1"), (2L, 21L, "u2"), (3L, 30L, "c")))
    // the on-disk set shrank to live manifest + retained snapshots + their files
    val after = dirFiles()
    assert(after.subsetOf(before), "vacuum must never create files")
    if (files > 0) assert(after.size < before.size, "expired-only files deleted")
    // idempotent: a second vacuum at the same retention is a no-op
    assert(KbDim.vacuum(dir, retain = 2) == ((0L, 0L)))
    // and the floor is guarded
    intercept[IllegalArgumentException](KbDim.vacuum(dir, retain = 0))
  }

  test("ROLLBACK restores as a new commit; history survives until vacuumed") {
    import graft.sources.KbDim
    reset()
    val dir = KbDim.resolveDir(spark)
    val good = KbDim.latestVersion(dir)
    spark.sql("UPDATE kb.dim SET v = -1, tag = 'bad' WHERE k <= 2")
    val bad = KbDim.latestVersion(dir)
    val restored = KbDim.rollback(dir, good)
    // a NEW version, not a rewind — and the live read equals the good state
    assert(restored == bad + 1, s"rollback must commit forward ($bad -> $restored)")
    assert(snap() == Set((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")))
    // forensics: the bad version is still time-travel readable...
    val badSnap = spark.sql(s"SELECT k, v, tag FROM kb.dim VERSION AS OF $bad")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(badSnap == Set((1L, -1L, "bad"), (2L, -1L, "bad"), (3L, 30L, "c")))
    // ...until a vacuum expires it
    KbDim.vacuum(dir, retain = 1)
    val e = intercept[Exception](
      spark.sql(s"SELECT * FROM kb.dim VERSION AS OF $bad").collect())
    assert(e.getMessage.contains("no snapshot"), e.getMessage)
    assert(snap() == Set((1L, 10L, "a"), (2L, 20L, "b"), (3L, 30L, "c")),
      "vacuum after rollback must keep the restored live state intact")
    // never-committed versions are rejected
    intercept[IllegalArgumentException](KbDim.rollback(dir, KbDim.latestVersion(dir) + 5))
  }

  test("snapshot diff is a MULTISET diff: duplicate rows are counted, not collapsed") {
    import spark.implicits._
    import graft.sources.KbDim
    reset()
    // two identical copies of (1, 10, 'a') in version A
    spark.sql("INSERT INTO kb.dim VALUES (1L, 10L, 'a')")
    val dir = KbDim.resolveDir(spark)
    val vA = KbDim.latestVersion(dir)
    spark.sql("DELETE FROM kb.dim WHERE k = 1")
    val vB = KbDim.latestVersion(dir)
    val a = spark.sql(s"SELECT k, v, tag FROM kb.dim VERSION AS OF $vA")
    val b = spark.sql(s"SELECT k, v, tag FROM kb.dim VERSION AS OF $vB")
    val deletes = a.exceptAll(b).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    // exceptAll (the s37 CDC read) must report BOTH deleted copies; a
    // set-based except would silently lose one change event
    assert(deletes.count(_ == ((1L, 10L, "a"))) == 2, deletes.mkString(","))
    assert(a.except(b).count() == 1, "sanity: set-based except collapses")
  }

  test("task-retry chaos: MERGE's ReplaceData write survives a first-attempt task death") {
    // real MERGE INTO on a retry-enabled local[4, 2] scheduler (subprocess,
    // see ChaosRetryRunner): the row-level write task dies after 3 rows are
    // staged, the retry rewrites, and the runner JVM asserts the commit
    // invariants — final state equals the set-algebra expectation, the dead
    // attempt burned no version (seed v1 → merge v2 exactly), time travel
    // to the seed snapshot still reads the old rows, manifest files all
    // exist, and no staging survives. Here: it ran, and the chaos fired.
    assert(ChaosRetryRunner.stat("merge", "injected") >= 1L)
    assert(ChaosRetryRunner.stat("merge", "version") == 2L)
    assert(ChaosRetryRunner.stat("merge", "rows") == 100L)
  }
}
