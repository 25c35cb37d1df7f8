package graft

import org.scalatest.Tag

/** Tag for specs whose ASSERTIONS include wall-clock bounds (scale
  * smokes, throughput contracts). They carry generous headroom but can
  * still flake on a heavily contended box — functional CI can exclude
  * them with `sbt "testOnly * -- -l graft.Perf"` and keep the measured
  * envelope as a separate gate. The driver's plain `sbt test` still runs
  * them (tags are opt-out, not opt-in).
  */
object PerfTag extends Tag("graft.Perf")
