package graft.tools

/** Harness probe: prints one JSON line to stdout. Used to verify that
  * `run / outputStrategy := StdoutOutput` (build.sbt) delivers the
  * forked JVM's stdout to the terminal WITHOUT sbt's "[info] " prefix —
  * the driver parses the last stdout line of `runMain graft.Bench` as
  * bare JSON, and a logger-decorated line fails that parse.
  */
object EchoProbe {
  def main(args: Array[String]): Unit = {
    println("""{"metric":"probe","value":1,"unit":"ok"}""")
    System.out.flush()
  }
}
