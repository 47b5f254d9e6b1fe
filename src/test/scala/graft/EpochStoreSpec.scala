package graft

import java.nio.file.Files

import graft.core.EpochStore

/** The epoch-swap commit primitive: sequential commits advance the
  * manifest; a commit whose epoch read is stale (a racing writer) must
  * fail loudly instead of silently absorbing the other writer's epoch.
  */
class EpochStoreSpec extends SparkSpec {

  test("commit guards against a racing writer's stale epoch read") {
    val path = Files.createTempDirectory("graft-epoch")
      .resolve("store").toString
    EpochStore.commitEpoch(spark, path, 1) // founding
    EpochStore.commitEpoch(spark, path, 2) // normal append
    // a writer that read epoch 1, lost the race, and now tries to
    // commit "its" epoch 2 would clobber the winner's rows — throw
    intercept[IllegalStateException] {
      EpochStore.commitEpoch(spark, path, 2)
    }
    // same for a skipped epoch (stale read in the other direction)
    intercept[IllegalStateException] {
      EpochStore.commitEpoch(spark, path, 4)
    }
    assert(EpochStore.currentEpoch(spark, path) === 2L)
  }

  test("a truncated or corrupt marker file names its path loudly") {
    val dir = Files.createTempDirectory("graft-epoch-bad")
    val bad = dir.resolve("MANIFEST_garbage")
    Files.writeString(bad, "12 notanumber")
    val ex = intercept[IllegalStateException] {
      EpochStore.readLongsFile(spark,
        new org.apache.hadoop.fs.Path(bad.toString))
    }
    assert(ex.getMessage.contains(bad.getFileName.toString),
      s"error must name the file: ${ex.getMessage}")
    assert(ex.getMessage.contains("notanumber"),
      "error must show the offending content")
    // an EMPTY marker (the classic truncation) is equally loud
    val empty = dir.resolve("MANIFEST_empty")
    Files.writeString(empty, "")
    val ex2 = intercept[IllegalStateException] {
      EpochStore.readLongsFile(spark,
        new org.apache.hadoop.fs.Path(empty.toString))
    }
    assert(ex2.getMessage.contains("MANIFEST_empty"))
  }
}
