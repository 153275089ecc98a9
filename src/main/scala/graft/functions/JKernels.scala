package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Java-friendly shim over [[Kernels]] for generated code: null instead
  * of Option, UTF8String in/out where the caller is Tungsten. Scala
  * objects emit static forwarders, so codegen can call
  * `graft.functions.JKernels.method(...)` directly.
  */
object JKernels {

  def parseDurationSeconds(s: UTF8String): java.lang.Double =
    if (s == null) null
    else Kernels.parseDurationSeconds(s.toString).map(Double.box).orNull

  def parseBytes(s: UTF8String): java.lang.Double =
    if (s == null) null
    else Kernels.parseBytes(s.toString).map(Double.box).orNull

  def ipMatches(ip: UTF8String, pattern: UTF8String): Boolean =
    ip != null && pattern != null && Kernels.ipMatches(ip.toString, pattern.toString)

  def logfmtGet(line: UTF8String, key: UTF8String): UTF8String =
    if (line == null || key == null) null
    else Kernels.logfmtGet(line.toString, key.toString)
      .map(UTF8String.fromString).orNull

  def decolorize(line: UTF8String): UTF8String =
    if (line == null) null
    else UTF8String.fromString(Kernels.decolorize(line.toString))

  def severityText(num: Int): UTF8String =
    UTF8String.fromString(Kernels.severityText(num))

  def deduceSeverity(text: UTF8String): Int =
    if (text == null) 0 else Kernels.deduceSeverity(text.toString)
}
