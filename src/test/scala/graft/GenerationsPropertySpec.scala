package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.util.Generations

/** Random-interleaving properties for the layout-generation seam
  * (graft.Serve's per-signal counter split, util/Generations.scala) —
  * the freshness machinery every HttpApi result cache and serving view
  * builds on. Two invariants under ANY interleaving of signal bumps,
  * maintenance bumps, and cache reads:
  *
  *   1. NO STALE SERVE: a change to any layout strictly moves the
  *      total (total changes ⟹ cache key changes), and a view read
  *      after its signal changed always re-opens — a reader can never
  *      observe pre-change contents after the change.
  *   2. NO GRATUITOUS RE-LIST: a view re-opens ONLY when its own
  *      signal or the maintenance counter moved since its last open —
  *      bumps to OTHER signals cause zero opens (the reason the split
  *      exists: re-opening the logs view pays a distributed
  *      mergeSchema footer job).
  */
object GenerationsPropertySpec extends Properties("Generations") {
  import Prop.propBoolean

  private val signals = Seq("logs", "points", "spans")

  private sealed trait Op
  private final case class Bump(signal: String) extends Op
  private case object Refresh extends Op
  private final case class Read(signal: String) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.oneOf(signals).map(Bump.apply),
    1 -> Gen.const(Refresh),
    5 -> Gen.oneOf(signals).map(Read.apply))

  private val opsGen: Gen[List[Op]] =
    Gen.chooseNum(1, 60).flatMap(n => Gen.listOfN(n, opGen))

  property("interleavings: strictly monotone total; reads fresh; opens only on own-gen movement") =
    Prop.forAll(opsGen) { ops =>
      val gens = new Generations(signals)
      // the "layout": a contents version per signal, moved by Bump
      val contents = scala.collection.mutable.Map(signals.map(_ -> 0L): _*)
      val opens = scala.collection.mutable.Map(signals.map(_ -> 0L): _*)
      val lives = signals.map(s => s ->
        new Generations.Live[Long](gens.of(s), () => {
          opens(s) += 1; contents(s)
        })).toMap
      // per signal: its observed generation at the last open (None =
      // never opened) — the oracle for invariant 2
      val lastOpenGen = scala.collection.mutable.Map[String, Long]()

      val checks = ops.map {
        case Bump(s) =>
          val t0 = gens.total
          contents(s) += 1
          gens.bump(s)
          (gens.total == t0 + 1) :| s"bump($s) must move total by 1"
        case Refresh =>
          val t0 = gens.total
          gens.refresh()
          (gens.total == t0 + 1) :| "refresh must move total by 1"
        case Read(s) =>
          val g = gens.of(s)()
          val opensBefore = opens(s)
          val mustOpen = !lastOpenGen.get(s).contains(g)
          val v = lives(s).get()
          if (mustOpen || opensBefore < opens(s)) lastOpenGen(s) = g
          Prop.all(
            // invariant 1: the read observes CURRENT contents — never
            // a pre-bump snapshot
            (v == contents(s)) :|
              s"stale read of $s: got $v, contents ${contents(s)}",
            // invariant 2: an open happened iff this view's own
            // generation moved since its last open
            (opens(s) == opensBefore + (if (mustOpen) 1 else 0)) :|
              s"$s opens: ${opens(s)} vs $opensBefore, mustOpen=$mustOpen")
      }
      Prop.all(checks: _*)
    }

  property("bumping one signal never re-opens another signal's view") =
    Prop.forAll(Gen.oneOf(signals), Gen.chooseNum(1, 20)) { (bumped, n) =>
      val gens = new Generations(signals)
      var opens = 0
      val other = signals.find(_ != bumped).get
      val live = new Generations.Live[Int](gens.of(other), () => { opens += 1; 1 })
      live.get() // first open
      (1 to n).foreach { _ => gens.bump(bumped); live.get(): Unit }
      (opens == 1) :| s"view of $other re-opened $opens times under $bumped bumps"
    }
}
