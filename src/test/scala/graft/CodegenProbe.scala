package graft

/** Shared execution-time codegen probe: captures CodeGenerator ERRORs
  * (janino 64 KB compile failures) and WholeStageCodegenExec
  * disabled-plan WARNs while `body` runs real Spark actions.
  *
  * Plan inspection is NOT enough for these guarantees — a plan builds
  * fine and only EXECUTION compiles codegen, so the probe must wrap an
  * action (batch count/write, or a streaming processAllAvailable; the
  * streaming wrapper is a DIFFERENT compilation context —
  * MicroBatchExecution replans per trigger — so batch coverage does
  * not transfer). Returns (compileErrors, disabledPlans).
  */
object CodegenProbe {
  def apply(body: => Unit): (Seq[String], Seq[String]) = {
    import org.apache.logging.log4j.{Level, LogManager}
    import org.apache.logging.log4j.core.{LogEvent, LoggerContext}
    import org.apache.logging.log4j.core.appender.AbstractAppender
    import org.apache.logging.log4j.core.config.Property
    val errors = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val disabled = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val appender = new AbstractAppender("graft_cg_probe", null, null, true,
        Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit = {
        val msg = e.getMessage.getFormattedMessage
        if (e.getLevel == Level.ERROR &&
            e.getLoggerName.contains("CodeGenerator")) errors.add(msg)
        if (e.getLoggerName.contains("WholeStageCodegen") &&
            msg.contains("codegen disabled")) disabled.add(msg)
        ()
      }
    }
    appender.start()
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try body finally {
      root.removeAppender("graft_cg_probe")
      ctx.updateLoggers()
    }
    import scala.jdk.CollectionConverters._
    (errors.asScala.toSeq, disabled.asScala.toSeq)
  }
}
