package graft

/** Exception family mirroring the reference's
  * dfsql/exceptions.py: DfsqlException > {CommandException,
  * QueryExecutionException}. */
class DfsqlException(msg: String) extends RuntimeException(msg)
class CommandException(msg: String) extends DfsqlException(msg)
class QueryExecutionException(msg: String) extends DfsqlException(msg)
