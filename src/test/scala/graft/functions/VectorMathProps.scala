package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ScalaCheck properties for the primitive vector kernels — in particular
  * that the ArrayData variants the native Catalyst expressions evaluate
  * are bit-identical to the plain-array kernels for ALL inputs, not just
  * the fixtures the example-based specs pin.
  */
object VectorMathProps extends Properties("VectorMath") {

  private val vec: Gen[Array[Float]] =
    Gen.nonEmptyListOf(Gen.chooseNum(-10f, 10f)).map(_.toArray)

  private val toks: Gen[List[String]] = Gen.nonEmptyListOf(Gen.identifier)

  property("lshBucket lands in [0, 2^nBits)") =
    forAll(vec, Gen.choose(1, 16)) { (v, n) =>
      val b = VectorMath.lshBucket(v, n)
      b >= 0 && b < (1 << n)
    }

  property("lshBucketArrayData == lshBucket (native-expression kernel)") =
    forAll(vec, Gen.choose(1, 16)) { (v, n) =>
      VectorMath.lshBucketArrayData(
        new GenericArrayData(v.map(java.lang.Float.valueOf)), n) ==
        VectorMath.lshBucket(v, n)
    }

  property("cosineArrayData == cosineD bit-for-bit (native-expression kernel)") =
    forAll(vec, vec) { (a, b) =>
      val viaArrayData = VectorMath.cosineArrayData(
        new GenericArrayData(a.map(java.lang.Float.valueOf)),
        new GenericArrayData(b.map(java.lang.Float.valueOf)))
      java.lang.Double.doubleToLongBits(viaArrayData) ==
        java.lang.Double.doubleToLongBits(VectorMath.cosineD(a, b))
    }

  property("cosineD is bit-exactly symmetric") =
    forAll(vec, vec) { (a, b) =>
      java.lang.Double.doubleToLongBits(VectorMath.cosineD(a, b)) ==
        java.lang.Double.doubleToLongBits(VectorMath.cosineD(b, a))
    }

  property("simhash60 is token-order invariant (multiset semantics)") =
    forAll(toks) { ts =>
      VectorMath.simhash60(ts.mkString(" ")) ==
        VectorMath.simhash60(ts.reverse.mkString(" "))
    }

  property("simhash60 ignores repeated separators") =
    forAll(toks) { ts =>
      VectorMath.simhash60(ts.mkString(" ")) ==
        VectorMath.simhash60(ts.mkString("  ") + " ")
    }
}
