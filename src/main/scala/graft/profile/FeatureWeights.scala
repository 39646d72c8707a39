package graft.profile

/** Feature-weight container — parity with the reference's
  * `core/feature_weights.py:1-46`: a flat feature→weight map with
  * optional metadata, JSON round-trip in the reference's shape
  * (`{"segment": null, "weights": {...}}`), attachable to
  * [[DatasetProfileView]] and carried through the GRFT1 binary serde.
  * Segmented feature weights are unsupported, matching the reference's
  * explicit `NotImplementedError`. The reference's writer half is the
  * WhyLabs HTTP API (out of sandbox scope, SURVEY §2.E).
  */
final case class FeatureWeights(
    weights: Map[String, Double],
    metadata: Map[String, String] = Map.empty) {

  /** Reference `to_json`: `{"segment": null, "weights": {...}}` with
    * keys in sorted order (a deterministic superset of the reference's
    * insertion order — dict order is not part of the contract). Non-
    * finite weights serialize as the bare NaN/Infinity tokens, like
    * python's default `json.dumps`. */
  def toJson: String = {
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def num(d: Double): String =
      if (d.isNaN) "NaN"
      else if (d.isPosInfinity) "Infinity"
      else if (d.isNegInfinity) "-Infinity"
      else d.toString
    weights.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}": ${num(v)}""" }
      .mkString("""{"segment": null, "weights": {""", ", ", "}}")
  }
}

object FeatureWeights {

  /** Strict parser for exactly the [[FeatureWeights.toJson]] shape (the
    * reference has no reader at all — round-trip is graft's addition).
    * Accepts the NaN/Infinity tokens python emits. */
  def fromJson(json: String): FeatureWeights = {
    val s = json.trim
    val open = s.indexOf("\"weights\"")
    require(open >= 0, "no weights object in feature-weights JSON")
    val brace = s.indexOf('{', open)
    require(brace >= 0 && s.endsWith("}}"), "malformed feature-weights JSON")
    val body = s.substring(brace + 1, s.length - 2).trim
    if (body.isEmpty) FeatureWeights(Map.empty)
    else {
      // split on top-level commas — keys may contain escaped quotes but
      // no unescaped ones, so a quote-state scan suffices
      val parts = Seq.newBuilder[String]
      val sb = new StringBuilder
      var inStr = false
      var escape = false
      body.foreach { c =>
        if (escape) { sb.append(c); escape = false }
        else if (c == '\\' && inStr) { sb.append(c); escape = true }
        else if (c == '"') { sb.append(c); inStr = !inStr }
        else if (c == ',' && !inStr) { parts += sb.result(); sb.clear() }
        else sb.append(c)
      }
      parts += sb.result()
      val weights = parts.result().map { p =>
        val colon = {
          // first colon after the closing key quote
          var i = 0; var inS = false; var esc = false; var at = -1
          while (i < p.length && at < 0) {
            val c = p.charAt(i)
            if (esc) esc = false
            else if (c == '\\' && inS) esc = true
            else if (c == '"') inS = !inS
            else if (c == ':' && !inS) at = i
            i += 1
          }
          require(at >= 0, s"malformed weight entry: $p"); at
        }
        val rawKey = p.substring(0, colon).trim
        require(rawKey.length >= 2 && rawKey.head == '"' && rawKey.last == '"',
          s"malformed weight key: $rawKey")
        val key = unescape(rawKey.substring(1, rawKey.length - 1))
        val v = p.substring(colon + 1).trim match {
          case "NaN" => Double.NaN
          case "Infinity" => Double.PositiveInfinity
          case "-Infinity" => Double.NegativeInfinity
          case n => n.toDouble
        }
        key -> v
      }.toMap
      FeatureWeights(weights)
    }
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }
}
