package graft.examples

import graft.api.StreamContext

/** Collatz fixpoint through `Stream.iterate` — the analog of the reference's
  * examples/collatz.rs: evolve all numbers one Collatz step per round until
  * every value reaches 1; state counts the not-yet-converged values.
  */
object Collatz {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000)
    val spark = StreamContext.localSession(4)
    val ctx = new StreamContext(spark)
    import spark.implicits._

    val (remaining, fin) = ctx.streamRange(n.toLong)
      .map(_ + 1)
      .iterate(200, Long.MaxValue) { (s, _) =>
        s.map(v => if (v <= 1) 1L else if (v % 2 == 0) v / 2 else 3 * v + 1)
      } { (s, _) => s.filter(_ > 1).collectCount() } { rem => rem > 0 }

    println(s"REMAINING=$remaining ALL_ONE=${fin.filter(_ != 1L).collectCount() == 0}")
    spark.stop()
  }
}
