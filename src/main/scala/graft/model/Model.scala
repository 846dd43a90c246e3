package graft.model

/** Core data model (SURVEY.md §1).
  *
  * The reference's fundamental abstraction is a set of 2-D points parsed from
  * `"x,y"` CSV lines (`big_data_computing_1.py:152-156`) and d-dimensional
  * float tuples (`big_data_computing_2.py:10-12`). Here both are given fixed
  * schemas at the source boundary (SURVEY.md §1.2): the string-vs-tuple duck
  * typing of the reference is a Python artifact, not a semantic requirement.
  */
final case class Point(id: Long, x: Double, y: Double)

/** d-dimensional point for the FFT / clustering path (`big_data_computing_2.py:10-12`). */
final case class VecPoint(id: Long, vec: Array[Double])

/** Parameters of the (D,M)-outlier pipelines (`big_data_computing_1.py:120-146`):
  * distance threshold D, neighbor bound M, report size K, parallelism L. */
final case class OutlierParams(d: Double, m: Int, k: Int, l: Int)

/** Parameters of the streaming frequent-items pipeline
  * (`big_data_computing_3.py:49-59`). */
final case class StreamParams(n: Long, phi: Double, eps: Double, delta: Double) {
  /** reservoir size m = ceil(1/phi) (`big_data_computing_3.py:58`) */
  def reservoirSize: Int = math.ceil(1.0 / phi).toInt
  /** sticky sampling rate r = ln(1/(phi*delta))/eps (`big_data_computing_3.py:59`) */
  def stickyRate: Double = math.log(1.0 / (phi * delta)) / eps
}
