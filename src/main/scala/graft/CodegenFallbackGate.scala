package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property

/** Standing gate against SILENT interpreted fallback: when janino fails
  * to compile a generated stage, Spark logs one ERROR from
  * `...codegen.CodeGenerator` and quietly executes the interpreted path —
  * results stay correct while the whole stage loses codegen (this is how
  * stock Spark 4.1.2's ElementAt-over-CreateArray defect hid until round
  * 9's manual log grep; `plans/SimplifyElementAt.scala`). This appender
  * turns that grep into a machine-checked field: [[Verify]] writes
  * `codegen_fallbacks` into `verify_summary.json` and [[Bench]] carries
  * it in the emitted JSON line, so a fallback introduced by any future
  * expression-layer change flags the round instead of surviving as a
  * silent 10-100× slowdown at scale.
  */
object CodegenFallbackGate {
  private val count = new AtomicInteger

  private lazy val installed: Boolean = {
    try {
      val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
      val appender = new AbstractAppender(
        "graft-codegen-fallback-gate", null, null, true, Property.EMPTY_ARRAY) {
        override def append(e: LogEvent): Unit = {
          val n = e.getLoggerName
          if (e.getLevel.isMoreSpecificThan(Level.ERROR) &&
              n != null && n.endsWith("CodeGenerator")) {
            count.incrementAndGet()
          }
        }
      }
      appender.start()
      val cfg = ctx.getConfiguration
      cfg.getRootLogger.addAppender(appender, Level.ERROR, null)
      ctx.updateLoggers()
      true
    } catch {
      case e: Throwable =>
        // never let the observability hook break the gate it observes
        System.err.println(s"[codegen-gate] install failed: ${e.getMessage}")
        false
    }
  }

  /** Idempotent; call before the first query runs. */
  def install(): Unit = { val _ = installed }

  def fallbacks: Int = count.get
}
