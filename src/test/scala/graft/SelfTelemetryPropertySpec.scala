package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.api.{RequestMetrics, SelfTelemetry}
import graft.sources.OtlpProto

/** Property: for ANY registry state, the OTLP metrics payload decodes
  * (through the repo's own wire decoder) back to exactly the registry's
  * numbers — counters match per (route, status), the `le` histogram is
  * the cumulative prefix of the power-of-two buckets with `_count` ==
  * the +Inf bucket, and `_sum` is the duration total. The exporter and
  * the decoder are independent implementations, so this pins the wire
  * format itself, not an inverse.
  */
object SelfTelemetryPropertySpec extends Properties("SelfTelemetry") {

  private val routeGen = Gen.oneOf(
    "/api/v1/query", "/loki/api/v1/query_range", "/v1/metrics", "/")
  private val reqGen = for {
    route <- routeGen
    status <- Gen.oneOf(200, 400, 401, 422, 503, -1)
    // spans the whole bucket range incl. the open-ended top
    durUs <- Gen.oneOf(Gen.chooseNum(0L, 4096L),
      Gen.chooseNum(1L << 20, 1L << 34))
  } yield (route, status, durUs)

  property("metrics payload == registry state, any traffic") =
    Prop.forAll(Gen.listOfN(60, reqGen)) { reqs =>
      val reg = new RequestMetrics("query")
      reqs.foreach { case (r, st, d) => reg.record(r, "GET", st, d) }
      val ms = OtlpProto.decodeMetrics(new SelfTelemetry(
        () => Seq(reg), () => "http://127.0.0.1:1", Nil, 60000L)
        .metricsPayload(5L))
      def of(n: String) = ms.filter(_.name == n)
      val byRoute = reqs.groupBy(_._1)

      val countersOk = byRoute.forall { case (route, rs) =>
        rs.groupBy(_._2).forall { case (status, hits) =>
          of("graft_http_requests_total").exists(m =>
            m.attrs("route") == route &&
              m.attrs("status") == status.toString &&
              m.gauge.contains(hits.size.toDouble))
        }
      }
      val histOk = byRoute.forall { case (route, rs) =>
        val buckets = of("graft_http_request_duration_seconds_bucket")
          .filter(_.attrs("route") == route)
          .sortBy(m => SelfTelemetrySpec.leVal(m.attrs("le")))
        val cumulative = buckets.zip(buckets.drop(1)).forall {
          case (a, b) => a.gauge.get <= b.gauge.get
        }
        val inf = buckets.last
        val countM = of("graft_http_request_duration_seconds_count")
          .find(_.attrs("route") == route).get
        val sumM = of("graft_http_request_duration_seconds_sum")
          .find(_.attrs("route") == route).get
        cumulative &&
          inf.attrs("le") == "+Inf" &&
          inf.gauge.contains(rs.size.toDouble) &&
          countM.gauge == inf.gauge &&
          math.abs(sumM.gauge.get - rs.map(_._3).sum / 1e6) < 1e-9 &&
          // every le count equals the number of requests at or under it
          buckets.forall { m =>
            val le = SelfTelemetrySpec.leVal(m.attrs("le"))
            // exact integer upper bound: 128·2^i µs (le·1e6 alone would
            // wobble through the 128e-6 binary representation)
            val upperUs =
              if (le.isPosInfinity) Long.MaxValue else math.round(le * 1e6)
            m.gauge.contains(rs.count(_._3 <= upperUs).toDouble)
          }
      }
      countersOk && histOk
    }
}
