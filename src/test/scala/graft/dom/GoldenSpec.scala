package graft.dom

import org.scalatest.funsuite.AnyFunSuite

/** Replays the checked-in golden hashes (src/test/resources/golden/) through
  * the sequential oracle kernel — guards every future tokenizer/extractor
  * change against silent semantic drift. Spark ≡ oracle is covered separately
  * by SparkJobSpec's partition-invariance + round-trip tests.
  */
class GoldenSpec extends AnyFunSuite {
  test("sf0.001 golden hashes reproduce (main/full/fidelity)") {
    val in = getClass.getResourceAsStream("/golden/sha256_sf0.001.tsv")
    assert(in != null, "golden file missing — run `sbt \"runMain graft.tools.GoldenGen\"`")
    val golden = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    assert(golden.size === 500)
    val fresh = graft.tools.GoldenGen.rows("/root/testdata/sf0.001")
    val mism = golden.zip(fresh).filter { case (a, b) => a != b }
    assert(mism.isEmpty, s"${mism.size} golden mismatches; first: ${mism.headOption}")
  }

  test("gnarly golden hashes reproduce (tree-construction fragments + tag soup)") {
    val in = getClass.getResourceAsStream("/golden/sha256_gnarly.tsv")
    assert(in != null, "gnarly golden file missing — run `sbt \"runMain graft.tools.GoldenGen\"`")
    val golden = scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    val fresh = graft.tools.GoldenGen.gnarlyRows
    assert(golden.size === fresh.size)
    val mism = golden.zip(fresh).filter { case (a, b) => a != b }
    assert(mism.isEmpty, s"${mism.size} gnarly mismatches; first: ${mism.headOption}")
  }
}
