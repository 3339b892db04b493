package sparkgraft;

import java.io.IOException;
import java.net.URI;
import org.apache.hadoop.conf.Configuration;
import org.apache.hadoop.fs.FileStatus;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * TEST-ONLY filesystem shim: serves any {@code s3a://bucket/...} URI
 * from the local filesystem (the bucket name is accepted and ignored;
 * the object key maps to the local absolute path). It exists so the
 * object-store sink can be exercised END TO END -- scheme resolution,
 * committer protocol, partitioned layout, read-back -- in a sandbox
 * with no network, no S3 endpoint and no hadoop-aws jar. Wire it with:
 *   spark.hadoop.fs.s3a.impl=sparkgraft.S3ALocalShim
 *   spark.driver.extraClassPath=<compiled classes dir>
 * Never deploy this: production uses the real hadoop-aws S3AFileSystem.
 */
public class S3ALocalShim extends RawLocalFileSystem {
  private URI uri;

  @Override
  public void initialize(URI name, Configuration conf) throws IOException {
    this.uri = URI.create(name.getScheme() + "://" + name.getAuthority());
    super.initialize(name, conf);
  }

  @Override
  public URI getUri() {
    // the RawLocalFileSystem constructor qualifies the working dir via
    // getUri() before initialize() has run -- fall back to a bare s3a URI
    return uri != null ? uri : URI.create("s3a:///");
  }

  @Override
  public String getScheme() {
    return uri != null ? uri.getScheme() : "s3a";
  }

  /**
   * RawLocalFileSystem's FileStatus loads permissions LAZILY via
   * {@code new java.io.File(path.toUri())}, which rejects non-file
   * schemes; return statuses with permissions already populated so the
   * lazy path never runs.
   */
  private FileStatus eager(FileStatus s) {
    return new FileStatus(
        s.getLen(),
        s.isDirectory(),
        s.getReplication(),
        s.getBlockSize(),
        s.getModificationTime(),
        s.getAccessTime(),
        s.isDirectory() ? FsPermission.getDirDefault() : FsPermission.getFileDefault(),
        null,
        null,
        s.getPath());
  }

  @Override
  public FileStatus getFileStatus(Path f) throws IOException {
    return eager(super.getFileStatus(f));
  }

  @Override
  public FileStatus[] listStatus(Path f) throws IOException {
    FileStatus[] in = super.listStatus(f);
    FileStatus[] out = new FileStatus[in.length];
    for (int i = 0; i < in.length; i++) {
      out[i] = eager(in[i]);
    }
    return out;
  }
}
