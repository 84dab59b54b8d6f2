package graft.text

import org.scalatest.funsuite.AnyFunSuite

/** Porter2 unit cases: spec examples (snowballstem.org sample vocabulary)
  * + pairs pinned by the reference's own golden outputs
  * (daily/02-19-2018/cleaned.csv and siblings). */
class Porter2Spec extends AnyFunSuite {

  private val cases = Seq(
    // pairs visible in the reference goldens (FIXTURES.md §A)
    "awesomely" -> "awesom", "edited" -> "edit", "tribute" -> "tribut",
    "thought" -> "thought", "guys" -> "guy", "really" -> "realli",
    "appreciate" -> "appreci", "science" -> "scienc", "spoilers" -> "spoiler",
    "made" -> "made", "friend" -> "friend", "learning" -> "learn",
    "future" -> "futur",
    // snowball sample vocabulary spot checks
    "consign" -> "consign", "consigned" -> "consign", "consigning" -> "consign",
    "consolingly" -> "consol", "knack" -> "knack", "knot" -> "knot",
    "knitting" -> "knit", "knots" -> "knot",
    "generate" -> "generat", "generates" -> "generat",
    "generously" -> "generous", "generical" -> "generic",
    "communism" -> "communism", "communities" -> "communiti",
    "arsenic" -> "arsenic",
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "innings" -> "inning",
    "proceed" -> "proceed", "exceed" -> "exceed", "succeed" -> "succeed",
    "ties" -> "tie", "cries" -> "cri", "gas" -> "gas", "gaps" -> "gap",
    "kiwis" -> "kiwi", "caresses" -> "caress",
    "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
    "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
    "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
    // golden-pinned NLTK behaviors (see Porter2 scaladoc)
    "dating" -> "date", "vacation" -> "vacat", "foundations" -> "foundat",
    "activities" -> "activ", "relation" -> "relat", "locations" -> "locat",
    "realized" -> "realiz", "realizing" -> "realiz", "floating" -> "float",
    "debating" -> "debat", "creating" -> "creat", "updating" -> "updat",
    "generating" -> "generat", "frustrated" -> "frustrat",
    "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
    "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail",
    "filing" -> "file", "hoping" -> "hope",
    "happy" -> "happi", "sky" -> "sky", "cry" -> "cri", "by" -> "by",
    "say" -> "say",
    "relational" -> "relat", "conditional" -> "condit",
    "rational" -> "ration", "valenci" -> "valenc", "hesitanci" -> "hesit",
    "digitizer" -> "digit", "conformabli" -> "conform",
    "radicalli" -> "radic", "differentli" -> "differ", "vileli" -> "vile",
    "analogousli" -> "analog", "vietnamization" -> "vietnam",
    "predication" -> "predic", "operator" -> "oper",
    "feudalism" -> "feudal", "decisiveness" -> "decis",
    "hopefulness" -> "hope", "callousness" -> "callous",
    "formaliti" -> "formal", "sensitiviti" -> "sensit",
    "sensibiliti" -> "sensibl",
    "triplicate" -> "triplic", "formative" -> "format", "formalize" -> "formal",
    "realization" -> "realize", "realize" -> "realiz",
    "electriciti" -> "electr", "electrical" -> "electr",
    "hopeful" -> "hope", "goodness" -> "good",
    "revival" -> "reviv", "allowance" -> "allow", "inference" -> "infer",
    "airliner" -> "airlin", "gyroscopic" -> "gyroscop",
    "adjustable" -> "adjust", "defensible" -> "defens",
    "irritant" -> "irrit", "replacement" -> "replac",
    "adjustment" -> "adjust", "dependent" -> "depend",
    "adoption" -> "adopt",
    "communism" -> "communism", "activate" -> "activ",
    "angulariti" -> "angular", "homologous" -> "homolog",
    "effective" -> "effect", "bowdlerize" -> "bowdler",
    "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
    "controll" -> "control", "roll" -> "roll")

  test("stems match Porter2 spec + reference goldens") {
    val bad = cases.collect {
      case (in, want) if Porter2.stem(in) != want =>
        s"$in: got ${Porter2.stem(in)}, want $want"
    }
    assert(bad.isEmpty, s"\n${bad.mkString("\n")}")
  }

  test("short words pass through") {
    assert(Porter2.stem("a") == "a")
    assert(Porter2.stem("an") == "an")
    assert(Porter2.stem("I") == "i")
  }
}
