package graft.profile

import org.scalatest.funsuite.AnyFunSuite

/** FeatureWeights parity (reference core/feature_weights.py): JSON in
  * the reference shape, GRFT1 carriage, and version compatibility. */
class FeatureWeightsSpec extends AnyFunSuite {

  test("toJson matches the reference shape; round-trips exactly") {
    val fw = FeatureWeights(Map("a" -> 1.5))
    assert(fw.toJson == """{"segment": null, "weights": {"a": 1.5}}""")
    val hairy = FeatureWeights(Map(
      "plain" -> 0.25,
      "quo\"te" -> -3.5,
      "back\\slash" -> 1e-7,
      "ctrlchar" -> 42.0,
      "nan" -> Double.NaN,
      "inf" -> Double.PositiveInfinity,
      "ninf" -> Double.NegativeInfinity))
    val back = FeatureWeights.fromJson(hairy.toJson)
    assert(back.weights.keySet == hairy.weights.keySet)
    hairy.weights.foreach { case (k, v) =>
      val b = back.weights(k)
      assert((v.isNaN && b.isNaN) || v == b, k)
    }
    assert(FeatureWeights.fromJson(FeatureWeights(Map.empty).toJson)
      .weights.isEmpty)
  }

  test("GRFT1 carries feature weights; v2 files read as None") {
    val view = DatasetProfileView(Map.empty,
      datasetTimestampMs = Some(123L),
      featureWeights = Some(FeatureWeights(
        Map("f1" -> 0.75, "f2" -> -1.0), Map("source" -> "shap"))))
    val back = ProfileSerde.fromBytes(ProfileSerde.toBytes(view))
    assert(back.featureWeights == view.featureWeights)
    val none = ProfileSerde.fromBytes(
      ProfileSerde.toBytes(view.copy(featureWeights = None)))
    assert(none.featureWeights.isEmpty)
    // fabricate the exact bytes the v2 writer produced: same container
    // minus the trailing feature-weights presence flag, version patched
    val v3 = ProfileSerde.toBytes(view.copy(featureWeights = None))
    val v2 = v3.dropRight(1)
    v2(8) = 2 // version int is big-endian at offset 5..8
    val old = ProfileSerde.fromBytes(v2)
    assert(old.featureWeights.isEmpty && old.datasetTimestampMs == Some(123L))
  }

  test("merge keeps the left weights, falls back to the right") {
    val a = DatasetProfileView(Map.empty,
      featureWeights = Some(FeatureWeights(Map("x" -> 1.0))))
    val b = DatasetProfileView(Map.empty,
      featureWeights = Some(FeatureWeights(Map("x" -> 9.0))))
    assert(a.merge(b).featureWeights.get.weights("x") == 1.0)
    assert(DatasetProfileView(Map.empty).merge(b)
      .featureWeights.get.weights("x") == 9.0)
    assert(a.merge(DatasetProfileView(Map.empty))
      .featureWeights.get.weights("x") == 1.0)
  }
}
