package graft.api

import scala.sys.process._
import scala.util.Try

/** Git context detection for run provenance — the reference's `_git.py`
  * (/root/reference/waddle/_git.py): resolve repo root, origin, branch, and
  * HEAD commit so runs link to code state. Like the reference, everything
  * is optional: no git / not a repo ⇒ None and runs proceed unlinked
  * (nullable repo_id/commit_sha — /root/reference/waddle/_schema.py:26-27,
  * asserted by tests/test_waddle.py:63-75).
  *
  * The reference also auto-commits dirty trees to a snapshot ref
  * (_git.py:81-89); that MUTATES the user's repo (objects + a ref appear
  * without the user asking). Here the same reproducibility comes without
  * the side effect: the `dirty` flag is explicit, and [[dirtyPatch]]
  * captures the uncommitted delta as TEXT — [[WaddleSession.initRun]]
  * stores it as a content-addressed run artifact (`__dirty.patch`), so a
  * run on a dirty tree can be reproduced with `git apply` while the
  * user's repo is never written to.
  */
object GitInfo {

  final case class RepoInfo(
      root: String, name: String, originUrl: Option[String],
      branch: String, commitSha: String, commitAuthor: String,
      commitMessage: String, dirty: Boolean)

  private def git(cwd: java.io.File, args: String*): Option[String] =
    Try(Process("git" +: args, cwd).!!(ProcessLogger(_ => ()))).toOption
      .map(_.trim).filter(_.nonEmpty)

  def detect(dir: String = "."): Option[RepoInfo] = {
    val cwd = new java.io.File(dir)
    for {
      root <- git(cwd, "rev-parse", "--show-toplevel")
      sha <- git(cwd, "rev-parse", "HEAD")
    } yield RepoInfo(
      root = root,
      name = new java.io.File(root).getName,
      originUrl = git(cwd, "remote", "get-url", "origin"),
      branch = git(cwd, "rev-parse", "--abbrev-ref", "HEAD").getOrElse("HEAD"),
      commitSha = sha,
      commitAuthor = git(cwd, "log", "-1", "--format=%an <%ae>").getOrElse(""),
      commitMessage = git(cwd, "log", "-1", "--format=%s").getOrElse(""),
      dirty = git(cwd, "status", "--porcelain").isDefined)
  }

  /** The uncommitted delta vs HEAD (tracked files), as unified-diff text —
    * None for a clean tree. Read-only: the repo gains no objects, refs, or
    * index changes.
    */
  def dirtyPatch(dir: String = "."): Option[String] = {
    val cwd = new java.io.File(dir)
    Try(Process(Seq("git", "diff", "HEAD"), cwd).!!(ProcessLogger(_ => ())))
      .toOption.filter(_.trim.nonEmpty)
  }
}
