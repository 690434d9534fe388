package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Base64, Expression, UnBase64}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import org.apache.spark.sql.graftshim.{Gunzip, Gzip, TryGunzip}

/** Catalyst optimizer rule: eliminate exact-inverse codec pairs.
  *
  * The reference dataflow decodes what upstream encoded —
  * base64(gzip(payload)) on the wire, gunzip(unbase64(...)) on ingest
  * (reference main.go:463–479). When both halves of a pair meet inside
  * one plan (fixture synthesis feeding decode, re-encode for the dead
  * letter channel, ad-hoc SQL over already-encoded columns), the pair is
  * a no-op by the round-trip laws the test suite proves
  * (GzipSpec: gunzip(gzip(x)) == x; base64 per RFC 4648):
  *
  *   gunzip(gzip(x))     → x   (also try_gunzip — gzip output is valid)
  *   unbase64(base64(x)) → x
  *
  * gzip(gunzip(x)) is NOT rewritten — re-compression is not
  * byte-identical (header metadata, compression level), and unbase64 is
  * lenient on non-canonical input so base64(unbase64(x)) is not x
  * either. Only the directions that are lawful identities fire.
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * (GraftExtensions), the idiomatic hook for engine-specific rewrites —
  * the operators themselves stay declarative and the optimizer removes
  * work a hand-scheduled engine would have to avoid by careful plumbing.
  */
object EliminateCodecRoundTrips extends Rule[LogicalPlan] {
  private def simplify(e: Expression): Expression = e match {
    case Gunzip(Gzip(inner))    => simplify(inner)
    case TryGunzip(Gzip(inner)) => simplify(inner) // gzip output is always valid
    case UnBase64(Base64(inner, _), _) => simplify(inner)
    case other => other.mapChildren(simplify)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e @ (_: Gunzip | _: TryGunzip | _: UnBase64) =>
        val s = simplify(e)
        if (s.fastEquals(e)) e else s
    }
}
