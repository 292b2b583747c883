package graft.tools

import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only object-store stand-in: local storage served under a
  * `mocks3:` scheme with S3-CLASS rename semantics — rename REPLACES
  * an existing destination instead of refusing, and no hard-link
  * surface — i.e. exactly the store class [[Artifacts.claimClass]]
  * maps to "none". Registered per-spec via `fs.mocks3.impl`; lets
  * the export-to-object-store dress rehearsal run the FULL write
  * path (Spark parquet writes, segment renames, manifest
  * publication) against the semantics the multi-writer guard exists
  * for, without a cloud connector. Implemented by delegation (not
  * subclassing RawLocalFileSystem) because the raw local status
  * objects lazily re-derive permissions from their PATH's URI and
  * blow up on a non-`file:` scheme.
  */
class MockS3FileSystem extends FileSystem {
  private var myUri: URI = URI.create("mocks3:///")
  private val local = new RawLocalFileSystem()
  private var conditional = false
  private var deferred = false
  private var liar = false
  private var mtimeSkew = false

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    local.initialize(URI.create("file:///"), conf)
    myUri = URI.create(s"${name.getScheme}:///")
    // CONDITIONAL-CREATE mode (round 16): models the public S3
    // `If-None-Match: *` conditional PUT (GA since 2024; surfaced by
    // Hadoop's S3A as an atomic create-if-absent) — create with
    // overwrite = false fails atomically on an existing object while
    // rename KEEPS its replace semantics. This is the store class
    // [[Artifacts.claimClass]] upgrades to "cput" when the deployment
    // attests the capability.
    conditional = conf.getBoolean("fs.mocks3.conditional.enabled", false)
    // DEFERRED-PRECONDITION mode (round 17): models how a real
    // conditional PUT actually fails — S3's `If-None-Match: *` is
    // evaluated when the PUT COMPLETES, so `create(overwrite=false)`
    // hands back a stream and a lost race surfaces as an IOException
    // at close(), with the competitor's committed object intact at
    // the destination. The body buffers locally and lands (or fails)
    // atomically at close — both racing orders are exercised.
    deferred = conf.getBoolean("fs.mocks3.conditional.deferred", false)
    // LIAR mode (round 17): the deployment ATTESTS conditional-create
    // support but the store does not actually have it —
    // create(overwrite=false) silently overwrites, exactly the
    // mis-attestation Artifacts' bootstrap capability self-test must
    // catch before any commit trusts the attestation.
    liar = conf.getBoolean("fs.mocks3.conditional.liar", false)
    // MTIME-SKEW mode (round 17): every status reports a synthetic
    // EPOCH modification time — the object-store connector class
    // whose "mtimes" are meaningless. Under it, any grace-age check
    // that trusts store mtimes sees every in-flight segment as
    // infinitely old; vacuum must age against WRITER-declared clocks
    // instead (the `.segclaim` ctime stamp).
    mtimeSkew = conf.getBoolean("fs.mocks3.mtime.skew", false)
  }

  override def getUri: URI = myUri
  override def getScheme: String = "mocks3"

  private def toLocal(p: Path): Path =
    new Path("file", null, p.toUri.getPath)

  /** Plain-FileStatus copy with the path mapped back to the mock
    * scheme. Permissions/owner are FIXED (round 17): raw-local loads
    * them lazily via a shell `ls`, which blows up when a racing
    * writer deletes the file between our listing and the load — and
    * no test cares about permission fidelity on an object-store mock
    * (real object stores have no POSIX permissions either).
    */
  private def fromLocal(st: FileStatus): FileStatus =
    new FileStatus(st.getLen, st.isDirectory, st.getReplication,
      st.getBlockSize,
      if (mtimeSkew) 0L else st.getModificationTime, st.getAccessTime,
      FsPermission.getDefault, "", "",
      new Path("mocks3", null, st.getPath.toUri.getPath))

  override def open(f: Path, bufferSize: Int) =
    local.open(toLocal(f), bufferSize)

  override def create(f: Path, permission: FsPermission,
      overwrite: Boolean, bufferSize: Int, replication: Short,
      blockSize: Long, progress: Progressable) =
    if (!overwrite && liar)
      // mis-attested store: "conditional" create silently REPLACES
      local.create(toLocal(f), permission, true, bufferSize,
        replication, blockSize, progress)
    else if (!overwrite && deferred) {
      // real-store conditional PUT: buffer the body, evaluate the
      // If-None-Match precondition atomically when the PUT completes
      val p = java.nio.file.Paths.get(f.toUri.getPath)
      new org.apache.hadoop.fs.FSDataOutputStream(
        new java.io.ByteArrayOutputStream() {
          override def close(): Unit = {
            if (p.getParent != null)
              java.nio.file.Files.createDirectories(p.getParent)
            try {
              val out = java.nio.file.Files.newOutputStream(p,
                java.nio.file.StandardOpenOption.CREATE_NEW,
                java.nio.file.StandardOpenOption.WRITE)
              try out.write(toByteArray) finally out.close()
            } catch {
              case _: java.nio.file.FileAlreadyExistsException =>
                throw new java.io.IOException(
                  "412 Precondition Failed: object exists (If-None-Match: *)")
            }
          }
        }, null)
    } else if (!overwrite && conditional) {
      // atomic create-if-absent (O_EXCL — the conditional PUT model);
      // an existing object fails the precondition at create time
      val p = java.nio.file.Paths.get(f.toUri.getPath)
      if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
      new org.apache.hadoop.fs.FSDataOutputStream(
        java.nio.file.Files.newOutputStream(p,
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE), null)
    } else
      local.create(toLocal(f), permission, overwrite, bufferSize,
        replication, blockSize, progress)

  override def append(f: Path, bufferSize: Int, progress: Progressable) =
    local.append(toLocal(f), bufferSize, progress)

  override def rename(src: Path, dst: Path): Boolean = {
    // object-store contract: a rename onto an existing object
    // silently REPLACES it (no atomic claim-if-absent primitive)
    if (exists(dst) && getFileStatus(dst).isFile) delete(dst, false)
    local.rename(toLocal(src), toLocal(dst))
  }

  override def delete(f: Path, recursive: Boolean) =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(fromLocal)

  override def setWorkingDirectory(dir: Path): Unit =
    local.setWorkingDirectory(toLocal(dir))

  override def getWorkingDirectory: Path = new Path("mocks3:///tmp")

  override def mkdirs(f: Path, permission: FsPermission) =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    fromLocal(local.getFileStatus(toLocal(f)))
}
