package graft.queries

import graft.Q

/** All oracle-checked queries, one per implemented operator (SURVEY §2). */
object Registry {
  def all: Seq[Q] =
    AggQueries.all ++ FilterQueries.all ++ ScalarQueries.all ++
      JoinQueries.all ++ WindowQueries.all ++ SortSetQueries.all ++
      OlapQueries.all ++ TrainingQueries.all ++ MvQueries.all ++
      EdgeQueries.all ++ SsbQueries.all ++ PdbQueries.all ++
      CrawlQueries.all
}
