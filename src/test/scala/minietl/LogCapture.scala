package minietl

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.{LogEvent, Logger => CoreLogger}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.{Configurator, Property}

import scala.collection.mutable

/** Captures warn-level log output from a named logger for the duration of a
  * block — used to assert the scale-guardrail warning paths (un-partitioned
  * window fills, non-converged connected components) actually fire.
  */
object LogCapture {

  /** Runs `body` with an in-memory appender on `loggerName` (level raised to
    * WARN for the duration); returns (result, captured warn+ messages).
    */
  def warnings[A](loggerName: String)(body: => A): (A, Seq[String]) = {
    val buf = mutable.Buffer[String]()
    val appender = new AbstractAppender(
      s"capture-${System.nanoTime()}", null, null, false, Property.EMPTY_ARRAY) {
      override def append(e: LogEvent): Unit =
        if (e.getLevel.isMoreSpecificThan(Level.WARN))
          buf.synchronized { buf += e.getMessage.getFormattedMessage }
    }
    appender.start()
    val logger = LogManager.getLogger(loggerName).asInstanceOf[CoreLogger]
    val prevLevel = logger.getLevel
    logger.addAppender(appender)
    Configurator.setLevel(loggerName, Level.WARN)
    try {
      val result = body
      (result, buf.synchronized(buf.toSeq))
    } finally {
      Configurator.setLevel(loggerName, prevLevel)
      logger.removeAppender(appender)
      appender.stop()
    }
  }
}
