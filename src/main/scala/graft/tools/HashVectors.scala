package graft.tools

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Dump Spark-XXH64 test vectors for scripts/xxh64_check.py's embedded
  * self-test: the python reimplementation must reproduce these exactly
  * before it is trusted as the third engine for the minhash pair sets. */
object HashVectors {
  def main(args: Array[String]): Unit = {
    def hs(s: String, seed: Long): Long =
      XXH64.hashUTF8String(UTF8String.fromString(s), seed)
    val samples = Seq("", "a", "hello", "hello world xyz",
      "0123456789abcdef0123456789abcdef_tail", "日本語テスト")
    samples.foreach(s => println(s"STR\t$s\t${hs(s, 42L)}"))
    println(s"LONG\t0\t${XXH64.hashLong(0L, 42L)}")
    println(s"LONG\t123456789\t${XXH64.hashLong(123456789L, 42L)}")
    println(s"LONGSEED7\t-1\t${XXH64.hashLong(-1L, 7L)}")
    println(s"INT\t10007\t${XXH64.hashInt(10007, 42L)}")
    println(s"CHAIN\tab|cd\t${hs("cd", hs("ab", 42L))}")
  }
}
