package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.{forAll, propBoolean}

import graft.io.Ingest
import graft.ops.Recode

/** Pure (driver-side) ScalaCheck properties — the Spark-dependent
  * invariants live in [[PropertySpec]] as seeded deterministic loops. */
object CheckProps extends Properties("graft") {

  private val codeGen: Gen[String] = for {
    front <- Gen.chooseNum(0, 9999)
    hasSuffix <- Gen.oneOf(true, false)
    suffix <- Gen.listOfN(2, Gen.chooseNum(0, 99)).map(_.mkString("."))
  } yield if (hasSuffix) s"$front.$suffix" else front.toString

  property("zeroPadCodeStr is idempotent") = forAll(codeGen) { c =>
    val once = Recode.zeroPadCodeStr(c)
    Recode.zeroPadCodeStr(once) == once
  }

  property("zeroPadCodeStr preserves the dotted suffix") = forAll(codeGen) { c =>
    val padded = Recode.zeroPadCodeStr(c)
    padded.split("\\.", 2).drop(1).toSeq == c.split("\\.", 2).drop(1).toSeq
  }

  property("zeroPadCodeStr pads to exactly max(2, original front length)") =
    forAll(codeGen) { c =>
      val orig = c.split("\\.", 2)(0)
      val front = Recode.zeroPadCodeStr(c).split("\\.", 2)(0)
      front.length == math.max(2, orig.length) && front.endsWith(orig)
    }

  property("parseVersion round-trips db_MAJOR_MINOR names (incl. minor >= 10)") =
    forAll(Gen.chooseNum(0, 99), Gen.chooseNum(0, 99)) { (maj, min) =>
      Ingest.parseVersion(s"db_${maj}_${min}_text").contains((maj, min))
    }

  property("parseVersion rejects non-versioned names") =
    forAll(Gen.alphaStr) { s =>
      !s.matches(".*db_\\d+_\\d+.*") ==> Ingest.parseVersion(s).isEmpty
    }
}
