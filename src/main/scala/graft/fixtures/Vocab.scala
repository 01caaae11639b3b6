package graft.fixtures

/** Embedded deterministic Arabic legal-style sentence vocabulary
  * (FIXTURES.md §4). Covers every document-type analyzer term list
  * (scripts/all-pdf-to-json-smart-structured.py:283-289), article
  * references (`مادة N`, :310), date patterns (`\d{4}/\d{1,2}/\d{1,2}`,
  * :315) and normalization-sensitive characters (أ إ آ ة ي diacritics),
  * restricted to the synthetic font charset.
  */
object Vocab {

  /** Ground-truth sentences drawn by doc_id-derived index. */
  val Sentences: IndexedSeq[String] = IndexedSeq(
    "نظام المحكمه التجاريه الجديد لسنه 1445",
    "لائحة تنظيم العمل رقم 77 بتاريخ 1444/11/03",
    "حكم محكمه الاستيناف في الدعوى رقم 8214",
    "قرار مجلس القضاء في القضيه المنظوره",
    "عقد اتفاقية شراكه بين شركه البناء والمقاوله",
    "مادة 12 فقره 3 من نظام المرافعات",
    "مجموعه الأحكام القضائيه السابقه للمحاكم",
    "قانون حمايه حقوق الملكيه الفكريه مادة 7",
    "بند خامس من الفصل الثالث للعقد الموقع",
    "دعوى تعويض عن اضرار بتاريخ 1443/5/21",
    "تنظيم اجراءات التقاضي امام المحاكم الاداريه",
    "سابقه قضائيه في مقاوله انشاء الطرق العامه",
    "اتفاقية تسويه وديه بين الطرفين دون حكم",
    "فقره ثانيه من المادة الاولى للائحه التنفيذيه",
    "نظام الـعمل الموحد رقم ٧٤ لسنه ١٤٤٥"
  )

  val V: Int = Sentences.length

  /** Skew angles (millidegrees) drawn by doc_id; all within the deskew
    * search grid (±3000 by 250).
    */
  val Angles: IndexedSeq[Int] = IndexedSeq(-2250, -1000, 0, 1250, 2750)

  /** Noise levels (ppm) drawn by doc_id. */
  val Noises: IndexedSeq[Int] = IndexedSeq(0, 3000, 8000)

  // deterministic per-doc draws shared by the generator AND the SQL oracle
  def sentenceIdx1(docId: Long): Int = ((docId * 31 + 7) % V).toInt
  def sentenceIdx2(docId: Long): Int = ((docId * 17 + 3) % V).toInt
  def angleIdx1(docId: Long): Int = (docId % Angles.length).toInt
  def angleIdx2(docId: Long): Int = ((docId / 5) % Angles.length).toInt
  def noiseIdx1(docId: Long): Int = (docId % Noises.length).toInt
  def noiseIdx2(docId: Long): Int = ((docId + 1) % Noises.length).toInt
}
