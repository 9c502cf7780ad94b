package graft.util

import java.nio.file.{Files, Path}
import java.util.Comparator

/** Temp-dir factory whose directories are removed on JVM exit, so repeated
  * Verify/Bench runs do not accumulate state under /tmp.
  */
object TempDirs {
  def create(prefix: String): Path = {
    val dir = Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(dir)))
    dir
  }

  def deleteRecursively(dir: Path): Unit =
    if (Files.exists(dir)) {
      val stream = Files.walk(dir)
      try stream.sorted(Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
      finally stream.close()
    }
}
