package graft.buildscripts

/** Fixture build scripts for Shell's `script` discovery (the compiled
  * analog of the reference's `build.py` / `build_*.py` in a method
  * package). `Build` and `Build_extra` must be listed; `Helper` must not.
  */
object Build {
  def description: String = "demo default build script"
  @volatile var lastArgs: List[String] = null
  def main(args: Array[String]): Unit = { lastArgs = args.toList }
}

object Build_extra {
  def description: String = "secondary demo script"
  def main(args: Array[String]): Unit = ()
}

/** Not a build script — name doesn't match Build/Build_*. */
object Helper {
  def description: String = "should never be listed"
  def main(args: Array[String]): Unit = ()
}
