package graft.util

import java.io.File
import java.nio.file.Files

/** Scratch directories for operators that materialize intermediate
  * layouts (partitioned round-trips, streaming upsert versions). Every
  * directory created here is deleted on JVM exit, so repeated
  * Verify/Bench runs in one process don't leak disk under /tmp.
  */
object TempDirs {

  def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }

  /** Create a temp directory and register it for deletion at JVM exit. */
  def scratch(prefix: String): String = {
    val dir = Files.createTempDirectory(prefix).toFile
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir.toString
  }
}
