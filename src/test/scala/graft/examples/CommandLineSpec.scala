package graft.examples

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Argument-validation parity with the reference CLI
  * (`reference:CommandLine.scala:239-244`): codependent alt-file/labels,
  * at-least-one-input, positive numerics — every violation a clean
  * message, never an exception from deep inside the run.
  */
class CommandLineSpec extends AnyFlatSpec with Matchers {

  import CommandLine.{GenCmd, SelectCmd, parse}

  behavior of "CommandLine.parse"

  it should "parse a full gen command" in {
    parse(Seq("gen", "--rows", "10", "--cols", "4", "--file", "m.csv",
      "--alt-file", "a.csv", "--labels", "l.csv", "--seed", "7")) shouldBe
      Right(GenCmd(10, 4, Some("m.csv"), Some(("a.csv", "l.csv")), Some(7L)))
  }

  it should "parse a minimal select command (default num-features)" in {
    parse(Seq("select", "--file", "m.csv")) shouldBe
      Right(SelectCmd(10, Some("m.csv"), None))
  }

  it should "enforce the alt-file/labels codependency both ways" in {
    parse(Seq("select", "--alt-file", "a.csv")).left.toOption.get should
      include("codependent")
    parse(Seq("select", "--file", "m.csv", "--labels", "l.csv"))
      .left.toOption.get should include("codependent")
    parse(Seq("gen", "--rows", "2", "--cols", "2", "--labels", "l.csv"))
      .left.toOption.get should include("codependent")
  }

  it should "require at least one input/output file" in {
    parse(Seq("select", "--num-features", "3")).left.toOption.get should
      include("at least one")
    parse(Seq("gen", "--rows", "2", "--cols", "2")).left.toOption.get should
      include("at least one")
  }

  it should "require positive integer numerics" in {
    parse(Seq("gen", "--rows", "0", "--cols", "2", "--file", "m.csv"))
      .left.toOption.get should include("--rows")
    parse(Seq("gen", "--rows", "x", "--cols", "2", "--file", "m.csv"))
      .left.toOption.get should include("--rows")
    parse(Seq("select", "--num-features", "-1", "--file", "m.csv"))
      .left.toOption.get should include("--num-features")
  }

  it should "require rows and cols for gen" in {
    parse(Seq("gen", "--file", "m.csv")).left.toOption.get should
      include("--rows is required")
  }

  it should "reject unknown options, duplicates, and malformed pairs" in {
    parse(Seq("select", "--file", "m.csv", "--bogus", "1"))
      .left.toOption.get should include("unknown option --bogus")
    parse(Seq("select", "--file", "a", "--file", "b"))
      .left.toOption.get should include("duplicate")
    parse(Seq("select", "--file")).left.toOption.get should
      include("needs a value")
    parse(Seq("select", "--file", "--num-features"))
      .left.toOption.get should include("needs a value")
    parse(Seq("select", "m.csv", "x")).left.toOption.get should
      include("expected an option")
  }

  it should "reject unknown subcommands with the usage message path" in {
    parse(Seq("frobnicate")).left.toOption.get should
      include("unknown subcommand")
    parse(Nil).left.toOption.get should include("missing subcommand")
  }
}
